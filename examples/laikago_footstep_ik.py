#!/usr/bin/env python
"""Solve laikago footstep placement with damped-least-squares IK.

The tds_tpu analog of the reference's examples/laikago_footstep_ik.cpp:
pick world-space toe targets (a footstep pattern shifted forward of the
stance pose), solve whole-body IK for all four toes simultaneously, and
verify the reached positions by forward kinematics.

Run: PYTHONPATH=. python examples/laikago_footstep_ik.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from tds_tpu.control.ik import IKMethod, IKTarget, inverse_kinematics
from tds_tpu.dynamics.kinematics import forward_kinematics_q
from tds_tpu.envs.laikago import LaikagoEnv


def toe_world_positions(model, q, toe_links):
    _, link_x_world, _ = forward_kinematics_q(model, q)
    return [link_x_world[li].pos for li in toe_links]


def main():
    env = LaikagoEnv(dtype=jnp.float32)
    model = env.model
    toe_links = [g.link_index for g in env.world.geoms[1]]

    q0, _ = env.initial_state(jax.random.PRNGKey(0))
    stance = toe_world_positions(model, q0, toe_links)
    print("stance toe positions:")
    for li, p in zip(toe_links, stance):
        print(f"  link {li}: {p}")

    # footstep pattern: front toes 8 cm forward, rear toes 4 cm forward
    step = jnp.array([0.08, 0.0, 0.0])
    targets = [
        IKTarget(link_index=li, position=p + step * (1.0 if i < 2 else 0.5))
        for i, (li, p) in enumerate(zip(toe_links, stance))
    ]

    result = inverse_kinematics(
        model, targets, q0, method=IKMethod.DAMPED_LM, max_iterations=40,
    )
    print(f"IK residual: {float(result.residual):.2e} "
          f"converged={bool(result.converged)}")

    reached = toe_world_positions(model, result.q, toe_links)
    for t, p in zip(targets, reached):
        err = float(jnp.linalg.norm(t.position - p))
        print(f"  link {t.link_index}: reached {p}  |err|={err:.2e}")


if __name__ == "__main__":
    main()
