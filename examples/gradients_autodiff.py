#!/usr/bin/env python
"""Differentiate rigid-body dynamics four ways and cross-check them.

The tds_tpu analog of the reference's python/examples/z_dual_numbers.py and
cppad_example.py: where the reference switches scalar types (dual numbers,
CppAD tapes, CodeGen) to get derivatives, here every mode is a jax
transform over the same function — forward (jacfwd ~ dual numbers),
reverse (jacrev ~ tape), finite differences, and grad-of-scalar-loss.

Run: PYTHONPATH=. python examples/gradients_autodiff.py
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from tds_tpu.dynamics import forward_dynamics, integrate_euler
from tds_tpu.model.pendulum import compound_pendulum


def main():
    model = compound_pendulum(2)
    gravity = jnp.array([0.0, 0.0, -9.81])

    def qdd_of_q(q):
        return forward_dynamics(model, q, jnp.zeros(2), jnp.zeros(2), gravity)

    q0 = jnp.array([0.7, -0.3])

    j_fwd = jax.jacfwd(qdd_of_q)(q0)   # dual-number analog
    j_rev = jax.jacrev(qdd_of_q)(q0)   # tape/adjoint analog
    eps = 1e-6
    j_fd = jnp.stack(
        [
            (qdd_of_q(q0 + eps * jnp.eye(2)[i]) - qdd_of_q(q0 - eps * jnp.eye(2)[i]))
            / (2 * eps)
            for i in range(2)
        ],
        axis=1,
    )
    print("d(qdd)/dq forward-mode:\n", j_fwd)
    print("max |fwd - rev|:", float(jnp.abs(j_fwd - j_rev).max()))
    print("max |fwd - fd| :", float(jnp.abs(j_fwd - j_fd).max()))

    # gradient THROUGH a 200-step rollout (what tapes make expensive and
    # jax.grad makes one line)
    def final_height(q_init):
        def body(carry, _):
            q, qd = carry
            qdd = forward_dynamics(model, q, qd, jnp.zeros(2), gravity)
            return integrate_euler(model, q, qd, qdd, 1e-3), None

        (q, qd), _ = jax.lax.scan(body, (q_init, jnp.zeros(2)), None, length=200)
        return -jnp.cos(q[0]) - jnp.cos(q[0] + q[1])  # tip height

    g = jax.grad(final_height)(q0)
    gf = (final_height(q0 + eps * jnp.eye(2)[0]) - final_height(q0 - eps * jnp.eye(2)[0])) / (2 * eps)
    print("d(tip height after 200 steps)/d(q0):", g)
    print("finite-difference check on q0[0]:", float(gf),
          " (|diff| = %.2e)" % abs(float(g[0]) - float(gf)))


if __name__ == "__main__":
    main()
