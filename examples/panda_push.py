#!/usr/bin/env python
"""Franka Panda pushes a box across the ground — manipulation through
contact (beyond the reference's locomotion-only demos; the panda asset
ships with TDS but is never simulated there).

Pipeline: URDF (franka_panda/panda.urdf) -> damped-LM IK waypoints for the
grasp-target link -> joint-space PD tracking -> end-effector sphere proxy
contacting a free box through the MLCP -> box slides on ground friction.
The panda's collision meshes are not bundled, so the end effector carries
a small sphere proxy (GeomAttachment on panda_grasptarget), the standard
reduced-contact model for pushing.

Run: PYTHONPATH=. python examples/panda_push.py   (CPU-friendly, ~30 s)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


# panda "home" configuration (7 arm joints + 2 fingers), elbow-down reach
HOME_Q = (0.0, 0.2, 0.0, -2.0, 0.0, 2.2, 0.79, 0.02, 0.02)
EE_LINK = 11  # panda_grasptarget
PUSH_START = (0.45, 0.0, 0.05)
PUSH_END = (0.68, 0.0, 0.05)
BOX_EXTENTS = (0.06, 0.06, 0.06)
BOX_START_X = 0.56


def build_scene(dtype=jnp.float64):
    from tds_tpu.contact.mlcp import ContactSolverParams
    from tds_tpu.model.geometry import Box, GeomAttachment, Sphere
    from tds_tpu.model.multibody import MultiBodyBuilder
    from tds_tpu.urdf.cache import construct
    from tds_tpu.world import build_world, make_ground_plane

    arm, _ = construct("franka_panda/panda.urdf", dtype=dtype)
    ee_geom = GeomAttachment(link_index=EE_LINK, shape=Sphere(0.025),
                             friction=0.3)

    b = MultiBodyBuilder(is_floating=True, name="box")
    mass = 0.2
    b.set_base_inertia(mass, (0, 0, 0),
                       np.diag(Box(BOX_EXTENTS).local_inertia(mass)))
    box = b.finalize(dtype=dtype)
    box_geom = GeomAttachment(link_index=-1, shape=Box(BOX_EXTENTS),
                              friction=0.3)

    plane_model, plane_geoms = make_ground_plane(dtype=dtype)
    world = build_world(
        [(plane_model, plane_geoms), (arm, (ee_geom,)), (box, (box_geom,))],
        solver=ContactSolverParams(pgs_iterations=10),
    )
    return world, arm, box


def ik_waypoints(arm, dtype=jnp.float64):
    """Joint targets for the start and end of the push stroke."""
    from tds_tpu.control.ik import IKMethod, IKTarget, inverse_kinematics

    q0 = jnp.asarray(HOME_Q, dtype)
    qs = []
    for target in (PUSH_START, PUSH_END):
        res = inverse_kinematics(
            arm,
            [IKTarget(link_index=EE_LINK,
                      position=jnp.asarray(target, dtype))],
            q0,
            method=IKMethod.DAMPED_LM,
            max_iterations=200,
        )
        assert bool(res.converged), (
            f"IK did not converge for {target}: residual {res.residual}"
        )
        qs.append(res.q)
        q0 = res.q  # warm-start the next waypoint
    return qs


def make_rollout(world, arm, box, q_ik0, q_ik1, steps=1000, stroke_steps=700,
                 dt=1e-3):
    from tds_tpu.control.pd import pd_tau
    from tds_tpu.world import world_step

    gravity = jnp.asarray([0.0, 0.0, -9.81], q_ik0.dtype)
    box_q0 = jnp.concatenate([
        jnp.asarray([0.0, 0.0, 0.0, 1.0], q_ik0.dtype),
        jnp.asarray([BOX_START_X, 0.0, BOX_EXTENTS[2] / 2 - 1e-4],
                    q_ik0.dtype),
    ])

    def rollout():
        qs = (jnp.zeros(0, q_ik0.dtype), q_ik0, box_q0)
        qds = (jnp.zeros(0, q_ik0.dtype), arm.zero_qd(), box.zero_qd())

        def step(carry, i):
            qs, qds = carry
            frac = jnp.clip(i / stroke_steps, 0.0, 1.0)
            q_target = q_ik0 + frac * (q_ik1 - q_ik0)
            tau = pd_tau(arm, qs[1], qds[1], q_target, kp=200.0, kd=10.0,
                         max_force=87.0)
            taus = (jnp.zeros(0, q_ik0.dtype), tau,
                    jnp.zeros(box.dof_actuated, q_ik0.dtype))
            qs, qds = world_step(world, qs, qds, taus, gravity, dt)
            return (qs, qds), (qs[2][..., 4], qs[2][..., 6])

        (qs, qds), (box_x, box_z) = jax.lax.scan(
            step, (qs, qds), jnp.arange(steps)
        )
        return qs, qds, box_x, box_z

    return rollout


def main():
    jax.config.update("jax_enable_x64", True)
    world, arm, box = build_scene()
    q_ik0, q_ik1 = ik_waypoints(arm)
    print(f"IK waypoints solved: stroke {PUSH_START} -> {PUSH_END}")

    rollout = jax.jit(make_rollout(world, arm, box, q_ik0, q_ik1))
    t0 = time.time()
    qs, qds, box_x, box_z = jax.block_until_ready(rollout())
    box_x, box_z = np.asarray(box_x), np.asarray(box_z)
    print(f"1000 steps in {time.time() - t0:.1f}s (compile included)")
    for i in range(0, 1000, 200):
        print(f"  t={i / 1000:.1f}s  box x={box_x[i]:+.3f} m  z={box_z[i]:.3f} m")
    moved = box_x[-1] - BOX_START_X
    print(f"final: box pushed {moved * 100:.1f} cm "
          f"({'ok' if moved > 0.04 else 'TOO SHORT'}), z={box_z[-1]:.3f} m")


if __name__ == "__main__":
    main()
