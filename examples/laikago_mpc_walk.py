#!/usr/bin/env python
"""Laikago trot walking with the full whole-body MPC stack
(laikago_tds_mpc.cpp analog): gait generator -> Raibert swing legs (IK +
joint PD) -> convex-MPC stance forces -> hybrid torques -> physics.

Run: PYTHONPATH=. python examples/laikago_mpc_walk.py [--seconds 4]
"""

import argparse

import jax
import jax.numpy as jnp

from tds_tpu.control.mpc.convex_mpc import MpcConfig
from tds_tpu.control.mpc.gait import GaitConfig
from tds_tpu.control.mpc.locomotion import (
    LocomotionMpcConfig,
    LocomotionMpcController,
    make_walk_step,
)
from tds_tpu.envs.laikago import LaikagoEnv


def build(desired_speed=(0.4, 0.0, 0.0), dtype=jnp.float32):
    env = LaikagoEnv(dtype=dtype)
    model = env.model
    toe_links = [g.link_index for g in env.world.geoms[1]]
    total_mass = float(jnp.sum(model.mass) + model.base_mass)
    mpc_cfg = MpcConfig(
        mass=total_mass,
        inertia=jnp.diag(jnp.asarray([0.07, 0.25, 0.25], dtype)),
        planning_horizon=10,
        timestep=0.025,
        solver_iterations=300,
        alpha=1e-6,
        # the reference's active _MPC_WEIGHTS
        # (torque_stance_leg_controller.py:80)
        qp_weights=jnp.asarray(
            [5, 5, 0.2, 0, 0, 10, 0, 0, 1, 1, 1, 0, 0], dtype
        ),
    )
    cfg = LocomotionMpcConfig(
        mpc=mpc_cfg,
        gait=GaitConfig.laikago_trotting(),
        desired_speed=desired_speed,
        desired_height=0.42,
    )
    controller = LocomotionMpcController(model, toe_links, cfg)
    return env, controller


def main():
    # f32 is plenty for the demo and halves compile time. Set here, NOT at
    # import time: the test suite imports build() and a module-level flip
    # would silently downgrade every later test in the same process.
    jax.config.update("jax_enable_x64", False)
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--speed", type=float, default=0.4)
    args = ap.parse_args()

    env, controller = build(desired_speed=(args.speed, 0.0, 0.0))
    control_every = 5
    step = make_walk_step(env, controller, control_every=control_every)

    state, _ = env.reset(jax.random.PRNGKey(0))
    q, qd = state.q, state.qd
    ctrl = controller.init_state(q)

    ticks = int(args.seconds / (env.dt * control_every))
    for i in range(ticks):
        ctrl, q, qd = step((ctrl, q, qd))
        if i % 40 == 0:
            pos, up = env.base_pose_xyz_rpy(q)
            print(
                f"t={i * control_every * float(env.dt):5.2f}s "
                f"x={float(pos[0]):+.3f} z={float(pos[2]):.3f} "
                f"up={float(up):.3f} vx={float(qd[0]):+.2f}"
            )
    pos, up = env.base_pose_xyz_rpy(q)
    print(
        f"final: x={float(pos[0]):+.3f} m in {args.seconds}s "
        f"({float(pos[0]) / args.seconds:.2f} m/s), upright={float(up) > 0.8}"
    )


if __name__ == "__main__":
    main()
