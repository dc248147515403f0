#!/usr/bin/env python
"""PD-servo a double pendulum to a joint-space target.

The tds_tpu analog of the reference's python/examples/pd_control.py
(qd_target=0 servo via TinyPDController): simulate 2000 steps of
ABA + PD torque and print the tracking error decaying.

Run: PYTHONPATH=. python examples/pd_control.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from tds_tpu.control.pd import pd_tau
from tds_tpu.dynamics import forward_dynamics, integrate_euler
from tds_tpu.model.pendulum import compound_pendulum


def main():
    model = compound_pendulum(2)
    target = jnp.array([0.8, -0.4])
    kp, kd, max_force = 400.0, 25.0, 500.0
    gravity = jnp.array([0.0, 0.0, -9.81])
    dt = 1e-3

    @jax.jit
    def step(q, qd):
        tau = pd_tau(model, q, qd, target, kp, kd, max_force)
        qdd = forward_dynamics(model, q, qd, tau, gravity)
        return integrate_euler(model, q, qd, qdd, dt)

    q, qd = jnp.zeros(2), jnp.zeros(2)
    for i in range(2001):
        if i % 400 == 0:
            err = float(jnp.linalg.norm(q - target))
            print(f"step {i:5d}  q={q}  |err|={err:.4f}")
        q, qd = step(q, qd)


if __name__ == "__main__":
    main()
