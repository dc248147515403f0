#!/usr/bin/env python
"""NeuralSim-style hybrid simulation demo (neural_augmentation.hpp analog).

Ground truth: a double pendulum with viscous joint friction the analytic
model does NOT include. A residual MLP on [q, qd] -> tau is trained by
differentiating through full rollouts so the augmented simulator matches
the ground-truth trajectories — the NeuralSim workflow (reference:
src/utils/neural_augmentation.hpp used by examples/neural_*.cpp).

Run: PYTHONPATH=. python examples/neural_augmentation_demo.py
"""

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from tds_tpu.dynamics import forward_dynamics, integrate_euler
from tds_tpu.model.pendulum import compound_pendulum
from tds_tpu.utils.neural_augmentation import (
    AugmentationSpec,
    Wiring,
    make_residual_dynamics,
)

DT = 5e-3
HORIZON = 120
GRAVITY = jnp.array([0.0, 0.0, -9.81])
TRUE_FRICTION = 0.35  # viscous coefficient missing from the analytic model


def rollout(dynamics_fn, q0, qd0, length=HORIZON):
    def body(carry, _):
        q, qd = carry
        qdd = dynamics_fn(q, qd)
        q, qd = integrate_euler(model, q, qd, qdd, DT)
        return (q, qd), q

    (_, _), qs = jax.lax.scan(body, (q0, qd0), None, length=length)
    return qs


model = compound_pendulum(2)


def true_dynamics(q, qd):
    tau = -TRUE_FRICTION * qd  # unmodeled viscous friction
    return forward_dynamics(model, q, qd, tau, GRAVITY)


def main():
    spec = AugmentationSpec(l2=1e-6).add_wiring(
        Wiring("tau_residual", input_dim=4, output_dim=2, hidden=(16, 16))
    )
    aug = make_residual_dynamics(model, spec, GRAVITY)

    # training data: ground-truth trajectories from varied initial states
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    q0s = jax.vmap(lambda k: 0.8 * jax.random.normal(k, (2,)))(keys)
    qd0s = jnp.zeros_like(q0s)
    targets = jax.vmap(lambda q0, qd0: rollout(true_dynamics, q0, qd0))(q0s, qd0s)

    zero_tau = jnp.zeros(2)

    def loss(params):
        def sim(q0, qd0):
            return rollout(lambda q, qd: aug(params, q, qd, zero_tau), q0, qd0)

        pred = jax.vmap(sim)(q0s, qd0s)
        return jnp.mean((pred - targets) ** 2) + spec.regularization(params)

    params = 0.01 * jax.random.normal(
        jax.random.PRNGKey(1), (spec.num_parameters,)
    )
    value_and_grad = jax.jit(jax.value_and_grad(loss))

    # Adam
    lr, b1, b2, eps = 3e-3, 0.9, 0.999, 1e-8
    m = jnp.zeros_like(params)
    v = jnp.zeros_like(params)
    initial = None
    for i in range(400):
        l, g = value_and_grad(params)
        if initial is None:
            initial = float(l)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** (i + 1))
        vh = v / (1 - b2 ** (i + 1))
        params = params - lr * mh / (jnp.sqrt(vh) + eps)
        if i % 50 == 0:
            print(f"iter {i:4d}  trajectory MSE {float(l):.6f}")

    final = float(value_and_grad(params)[0])
    print(f"\ninitial MSE {initial:.6f} -> final {final:.6f} "
          f"({initial / max(final, 1e-12):.0f}x reduction)")

    # held-out check: the learned residual should recover -c*qd
    q = jnp.array([0.4, -0.2])
    qd = jnp.array([1.0, -0.5])
    learned = spec.apply(params, "tau_residual", jnp.concatenate([q, qd]))
    print("residual at test state:", learned, " truth:", -TRUE_FRICTION * qd)
    return initial, final


if __name__ == "__main__":
    main()
