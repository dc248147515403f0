#!/usr/bin/env python
"""Billiard shot optimization — gradients through contact.

Analog of the reference's python/examples/billiard_optimization.py: find the
initial velocity of a cue ball so that, after colliding with a target ball,
the target ends at a goal position. The loss differentiates through the
sphere-sphere contact impulses.

Run: PYTHONPATH=. python examples/billiard_optimization.py
"""

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from tds_tpu.contact.mlcp import ContactSolverParams
from tds_tpu.model.geometry import GeomAttachment, Sphere
from tds_tpu.model.multibody import MultiBodyBuilder
from tds_tpu.world import build_world, make_ground_plane, world_step

GRAVITY = jnp.array([0.0, 0.0, -9.81])
RADIUS = 0.06
GOAL = jnp.array([0.9, 0.2])


def make_ball():
    b = MultiBodyBuilder(is_floating=True, name="ball")
    m = 0.17
    i = 0.4 * m * RADIUS**2
    b.set_base_inertia(m, (0, 0, 0), np.diag([i] * 3))
    model = b.finalize()
    geom = (GeomAttachment(link_index=-1, shape=Sphere(RADIUS), friction=0.2,
                           restitution=0.9),)
    return model, geom


def main():
    ball, geom = make_ball()
    plane = make_ground_plane()
    world = build_world(
        [plane, (ball, geom), (ball, geom)],
        solver=ContactSolverParams(restitution=0.9, friction=0.2,
                                   pgs_iterations=4),
    )

    cue0 = ball.zero_q().at[4:7].set(jnp.array([0.0, 0.0, RADIUS]))
    target0 = ball.zero_q().at[4:7].set(jnp.array([0.5, 0.05, RADIUS]))

    def final_target_xy(cue_velocity_xy, steps=600):
        qs = (jnp.zeros(0), cue0, target0)
        qd_cue = ball.zero_qd().at[3:5].set(cue_velocity_xy)
        qds = (jnp.zeros(0), qd_cue, ball.zero_qd())
        taus = (jnp.zeros(0),) * 3

        def step(carry, _):
            qs, qds = carry
            return world_step(world, qs, qds, taus, GRAVITY, 2.5e-3), None

        (qs, qds), _ = jax.lax.scan(step, (qs, qds), None, length=steps)
        return qs[2][4:6]

    def loss(v):
        return jnp.sum((final_target_xy(v) - GOAL) ** 2)

    v = jnp.array([2.0, 0.0])  # hitting initialization
    grad = jax.jit(jax.grad(loss))
    lval = jax.jit(loss)
    print(f"initial loss {float(lval(v)):.4f}")
    # impulsive contacts make raw gradient magnitudes spiky: use
    # normalized-gradient steps to stay on the hit manifold
    lr = 0.05
    for i in range(60):
        g = grad(v)
        v = v - lr * g / (jnp.linalg.norm(g) + 1e-9)
        if i % 10 == 9:
            print(f"iter {i+1}: loss {float(lval(v)):.5f} v = {np.asarray(v)}")
    final = final_target_xy(v)
    print(f"optimized shot velocity {np.asarray(v)}")
    print(f"target ball ends at {np.asarray(final)} (goal {np.asarray(GOAL)})")


if __name__ == "__main__":
    main()
