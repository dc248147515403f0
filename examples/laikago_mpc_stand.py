#!/usr/bin/env python
"""Laikago balance-standing with the convex-MPC stance controller
(laikago_tds_mpc.cpp analog, standing phase).

Runs the physics env with MPC-computed ground-reaction forces mapped to
joint torques; prints base height/orientation over time and optionally
streams to MeshCat.

Run: PYTHONPATH=. python examples/laikago_mpc_stand.py [--steps 500]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tds_tpu.control.mpc.convex_mpc import MpcConfig, compute_contact_forces
from tds_tpu.control.mpc.stance_leg import stance_torques_from_forces
from tds_tpu.dynamics.kinematics import forward_kinematics_q
from tds_tpu.envs.laikago import LaikagoEnv


def main():
    # f32 demo precision; set inside main so importing this module
    # never mutates global JAX config (see laikago_mpc_walk.py)
    jax.config.update("jax_enable_x64", False)
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args()

    env = LaikagoEnv(dtype=jnp.float32)
    model = env.model
    # toe links carry the sphere collision geoms
    toe_links = [g.link_index for g in env.world.geoms[1]]
    total_mass = float(jnp.sum(model.mass) + model.base_mass)
    cfg = MpcConfig(
        mass=total_mass,
        inertia=jnp.diag(jnp.asarray([0.07, 0.25, 0.25], jnp.float32)),
        planning_horizon=10,
        timestep=0.025,
        solver_iterations=300,
        alpha=1e-6,
        qp_weights=jnp.asarray(
            [5, 5, 0.2, 0, 0, 10, 0, 0, 1, 1, 1, 1, 0], jnp.float32
        ),
    )

    state, obs = env.reset(jax.random.PRNGKey(0))
    q, qd = state.q, state.qd

    @jax.jit
    def control_step(q, qd):
        pos, up = env.base_pose_xyz_rpy(q)
        rpy = q[3:6]
        vel = qd[3:6] * 0 + qd[0:3]  # fixed-base emulation: first 3 prismatic vels
        ang = qd[3:6]
        _, lxw, _ = forward_kinematics_q(model, q)
        feet_world = jnp.stack([lxw[l].pos for l in toe_links])
        feet_body = feet_world - pos[None, :]
        forces = compute_contact_forces(
            cfg,
            com_position=pos,
            com_velocity=vel,
            com_rpy=rpy,
            com_angular_velocity=ang,
            foot_contact_states=jnp.ones(len(toe_links), jnp.float32),
            foot_positions_body=feet_body,
            desired_com_position=jnp.asarray([0.0, 0.0, 0.42], jnp.float32),
            desired_com_velocity=jnp.zeros(3, jnp.float32),
            desired_com_rpy=jnp.zeros(3, jnp.float32),
            desired_com_angular_velocity=jnp.zeros(3, jnp.float32),
        )
        tau_full = stance_torques_from_forces(
            model, q, toe_links, feet_world, forces
        )
        # actuated part only (skip the 6 passive base-emulation dofs)
        return tau_full[6:], forces

    @jax.jit
    def sim_steps(q, qd, tau, n=25):
        def body(carry, _):
            q, qd = carry
            from tds_tpu.control.pd import pd_tau  # damping assist
            from tds_tpu.dynamics.forward_dynamics import forward_dynamics_from_kin
            from tds_tpu.dynamics.integrator import integrate_euler_qdd, integrate_q
            from tds_tpu.dynamics.kinematics import fk_links
            from tds_tpu.world import resolve_contacts

            full_tau = jnp.zeros(model.dof_actuated, q.dtype).at[6:].set(tau)
            kin = fk_links(model, q, qd)
            qdd = forward_dynamics_from_kin(model, kin, q, qd, full_tau, env.gravity)
            qd2 = integrate_euler_qdd(model, q, qd, qdd, env.dt)
            zero = jnp.zeros(0, q.dtype)
            qds = resolve_contacts(env.world, (zero, q), (zero, qd2), env.dt,
                                   kins=[None, kin])
            q2, qd3 = integrate_q(model, q, qds[1], env.dt)
            return (q2, qd3), None

        (q, qd), _ = jax.lax.scan(body, (q, qd), None, length=n)
        return q, qd

    for i in range(args.steps // 25):
        tau, forces = control_step(q, qd)
        q, qd = sim_steps(q, qd, tau)
        pos, up = env.base_pose_xyz_rpy(q)
        print(
            f"t={i*25*float(env.dt):.2f}s height={float(pos[2]):.3f} "
            f"up={float(up):.3f} sum_fz={float(jnp.sum(forces[:,2])):.1f}"
        )


if __name__ == "__main__":
    main()
