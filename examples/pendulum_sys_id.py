#!/usr/bin/env python
"""Pendulum system identification (pendulum_sys_id.cpp analog).

Recovers link masses of a 2-link pendulum from an observed trajectory by
differentiating through the full rollout — the model is built FROM the
parameters inside the loss.

Run: PYTHONPATH=. python examples/pendulum_sys_id.py
"""

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from tds_tpu.dynamics import forward_dynamics, integrate_euler
from tds_tpu.model.pendulum import compound_pendulum
from tds_tpu.utils.estimation import (
    EstimationParameter,
    OptimizationProblem,
    adam_estimate,
)

GRAVITY = jnp.array([0.0, 0.0, -9.81])
TRUE_MASSES = [0.75, 1.9]


def rollout(model, n=400):
    q0 = jnp.array([0.9, -0.3])

    def step(carry, _):
        q, qd = carry
        qdd = forward_dynamics(model, q, qd, jnp.zeros(2), GRAVITY)
        return integrate_euler(model, q, qd, qdd, 1e-3), q

    _, traj = jax.lax.scan(step, (q0, jnp.zeros(2)), None, length=n)
    return traj


def main():
    observed = rollout(compound_pendulum(2, masses=TRUE_MASSES))
    base = compound_pendulum(2)

    def cost(x):
        scale = x / base.mass
        model = base.replace(
            mass=x,
            com=base.com * scale[:, None],
            inertia=base.inertia * scale[:, None, None],
        )
        return jnp.mean((rollout(model) - observed) ** 2)

    problem = OptimizationProblem(
        cost,
        [
            EstimationParameter("mass0", 1.2, minimum=0.1, maximum=5.0),
            EstimationParameter("mass1", 1.2, minimum=0.1, maximum=5.0),
        ],
    )
    x, c, history = adam_estimate(problem, learning_rate=0.05, iterations=200)
    print(f"estimated masses: {np.asarray(x)} (true {TRUE_MASSES})")
    print(f"final cost {c:.2e} after {len(history)} iterations")


if __name__ == "__main__":
    main()
