"""MIT-Cheetah convex MPC for quadruped stance forces, fully in JAX.

Port of examples/whole_body_control/osqp_mpc_controller.hpp:149-320
(Di Carlo et al., "Dynamic Locomotion in the MIT Cheetah 3 Through Convex
Model-Predictive Control", IROS 2018):

- 13-state linearized CoM dynamics X = [rpy, pos, omega, v, -g] with
  Xdot = A X + B u; A couples omega->rpy through Rz(yaw)^T and carries the
  gravity integrator; B has per-foot [I_w^-1 [r]x ; 1/m] blocks
- discretization via the matrix exponential of [[A, B], [0, 0]] dt
  (truncated series — the reference's Eigen ::exp() equivalent)
- condensed QP over the horizon: min ||A_qp x0 + B_qp U - X_des||_Q^2
  + alpha ||U||^2 with friction-pyramid bounds per foot
- solved with fixed-iteration projected FISTA (projection = clamp fz to
  [fz_min, fz_max]*contact then fx, fy to +-mu*fz) — jit/vmap/grad-able,
  replacing the reference's OSQP/qpOASES dependency

All shapes are static (num_legs, horizon, iterations), so the whole
controller compiles into the simulation step.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

STATE_DIM = 13


class MpcConfig(NamedTuple):
    mass: float
    inertia: jnp.ndarray  # (3,3) body inertia
    num_legs: int = 4
    planning_horizon: int = 10
    timestep: float = 0.025
    qp_weights: jnp.ndarray = None  # (13,)
    alpha: float = 1e-5
    friction_coeff: float = 0.45
    fz_min: float = 10.0
    fz_max: float = 210.0  # ~ mass*g/2 upper bound per the reference usage
    solver_iterations: int = 200


def _rpy_rate_matrix(yaw):
    """Maps world angular velocity to rpy rates, small-angle Rz(yaw)^T
    (CalculateAMat; the MIT paper's yaw-only approximation)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(yaw)
    o = jnp.ones_like(yaw)
    return jnp.stack(
        [
            jnp.stack([c, s, z], axis=-1),
            jnp.stack([-s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def calculate_a_mat(rpy, dtype):
    a = jnp.zeros((STATE_DIM, STATE_DIM), dtype)
    a = a.at[0:3, 6:9].set(_rpy_rate_matrix(rpy[2]).astype(dtype))
    a = a.at[3:6, 9:12].set(jnp.eye(3, dtype=dtype))
    a = a.at[11, 12].set(1.0)  # vz integrates -g
    return a


def calculate_b_mat(inv_mass, inv_inertia_world, foot_positions):
    """(13, 3*num_legs): torque rows I_w^-1 [r]x, force rows 1/m."""
    from tds_tpu.algebra.spatial import cross_matrix

    num_legs = foot_positions.shape[0]
    dtype = foot_positions.dtype
    b = jnp.zeros((STATE_DIM, 3 * num_legs), dtype)
    for leg in range(num_legs):
        rx = cross_matrix(foot_positions[leg])
        b = b.at[6:9, 3 * leg : 3 * leg + 3].set(inv_inertia_world @ rx)
        b = b.at[9:12, 3 * leg : 3 * leg + 3].set(inv_mass * jnp.eye(3, dtype=dtype))
    return b


def discretize(a_mat, b_mat, dt, order: int = 6):
    """exp([[A, B],[0,0]] dt) via truncated Taylor series
    (CalculateExponentials analog; order-6 matches Eigen's accuracy for
    these well-scaled matrices)."""
    n = a_mat.shape[0]
    m = b_mat.shape[1]
    dtype = a_mat.dtype
    ab = jnp.zeros((n + m, n + m), dtype)
    ab = ab.at[:n, :n].set(a_mat * dt)
    ab = ab.at[:n, n:].set(b_mat * dt)
    result = jnp.eye(n + m, dtype=dtype)
    term = jnp.eye(n + m, dtype=dtype)
    for k in range(1, order + 1):
        term = term @ ab / k
        result = result + term
    return result[:n, :n], result[:n, n:]


def condensed_qp_mats(a_exp, b_exp, horizon: int):
    """A_qp (13h, 13), B_qp (13h, 3l h): unrolled prediction matrices
    (CalculateQpMats)."""
    n = a_exp.shape[0]
    m = b_exp.shape[1]
    dtype = a_exp.dtype
    powers = [jnp.eye(n, dtype=dtype)]
    for _ in range(horizon):
        powers.append(a_exp @ powers[-1])
    a_qp = jnp.concatenate([powers[k + 1] for k in range(horizon)], axis=0)
    rows = []
    for i in range(horizon):
        row = [
            powers[i - j] @ b_exp if j <= i else jnp.zeros((n, m), dtype)
            for j in range(horizon)
        ]
        rows.append(jnp.concatenate(row, axis=1))
    b_qp = jnp.concatenate(rows, axis=0)
    return a_qp, b_qp


def _project_pyramid(u, contact, config: MpcConfig):
    """Per-foot friction-pyramid projection over the whole horizon:
    fz clamped to [fz_min, fz_max]*contact, then |fx|,|fy| <= mu*fz."""
    h = config.planning_horizon
    f = u.reshape(h, config.num_legs, 3)
    fz = jnp.clip(
        f[..., 2],
        config.fz_min * contact[None, :],
        config.fz_max * contact[None, :],
    )
    lim = config.friction_coeff * fz
    fx = jnp.clip(f[..., 0], -lim, lim)
    fy = jnp.clip(f[..., 1], -lim, lim)
    return jnp.stack([fx, fy, fz], axis=-1).reshape(-1)


def compute_contact_forces(
    config: MpcConfig,
    com_position,
    com_velocity,
    com_rpy,
    com_angular_velocity,
    foot_contact_states,  # (num_legs,) 0/1
    foot_positions_body,  # (num_legs, 3)
    desired_com_position,
    desired_com_velocity,
    desired_com_rpy,
    desired_com_angular_velocity,
    gravity: float = 9.81,
):
    """Optimal stance forces (num_legs, 3) in the yaw-aligned world frame
    (ComputeContactForces analog). Differentiable; batch with vmap."""
    dtype = foot_positions_body.dtype
    # default weights = the reference's _MPC_WEIGHTS
    # (python/examples/whole_body_control/torque_stance_leg_controller.py:80)
    qp_w = (
        config.qp_weights
        if config.qp_weights is not None
        else jnp.asarray(
            [5.0, 5.0, 0.2, 0.0, 0.0, 10.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 0.0],
            dtype,
        )
    )
    contact = jnp.asarray(foot_contact_states, dtype)

    x0 = jnp.concatenate(
        [
            jnp.asarray(com_rpy, dtype),
            jnp.asarray(com_position, dtype),
            jnp.asarray(com_angular_velocity, dtype),
            jnp.asarray(com_velocity, dtype),
            jnp.asarray([-gravity], dtype),
        ]
    )
    x_des_single = jnp.concatenate(
        [
            jnp.asarray(desired_com_rpy, dtype),
            jnp.asarray(desired_com_position, dtype),
            jnp.asarray(desired_com_angular_velocity, dtype),
            jnp.asarray(desired_com_velocity, dtype),
            jnp.asarray([-gravity], dtype),
        ]
    )
    x_des = jnp.tile(x_des_single, config.planning_horizon)

    inertia = jnp.asarray(config.inertia, dtype)
    from tds_tpu.algebra.linalg import inv3
    from tds_tpu.model.multibody import _np_rpy
    import numpy as _np

    rot = _rpy_rate_matrix(jnp.asarray(com_rpy[2], dtype)).T  # Rz(yaw)
    inertia_world = rot @ inertia @ rot.T
    inv_inertia_world = inv3(inertia_world)

    a_mat = calculate_a_mat(jnp.asarray(com_rpy, dtype), dtype)
    b_mat = calculate_b_mat(1.0 / config.mass, inv_inertia_world, foot_positions_body)
    a_exp, b_exp = discretize(a_mat, b_mat, config.timestep)
    a_qp, b_qp = condensed_qp_mats(a_exp, b_exp, config.planning_horizon)

    # quadratic objective: (A x0 + B U - Xd)^T Q (A x0 + B U - Xd) + a U^T U
    q_diag = jnp.tile(qp_w, config.planning_horizon)
    bt_q = b_qp.T * q_diag[None, :]
    p_mat = 2.0 * (bt_q @ b_qp + config.alpha * jnp.eye(b_qp.shape[1], dtype=dtype))
    q_vec = 2.0 * bt_q @ (a_qp @ x0 - x_des)

    # FISTA with pyramid projection; step from a power-iteration Lipschitz est.
    def power_iter(_, v):
        v = p_mat @ v
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)

    v0 = jnp.ones(p_mat.shape[0], dtype) / p_mat.shape[0]
    v = jax.lax.fori_loop(0, 12, power_iter, v0)
    lipschitz = jnp.maximum(jnp.vdot(v, p_mat @ v), 1e-6)
    step = 1.0 / lipschitz

    u0 = jnp.zeros(b_qp.shape[1], dtype)
    # warm start: weight supported by stance legs
    n_stance = jnp.maximum(jnp.sum(contact), 1.0)
    fz0 = config.mass * gravity / n_stance
    u0 = _project_pyramid(
        u0.reshape(config.planning_horizon, config.num_legs, 3)
        .at[..., 2]
        .set(fz0)
        .reshape(-1),
        contact,
        config,
    )

    def fista(carry, _):
        u, y, t = carry
        grad = p_mat @ y + q_vec
        u_new = _project_pyramid(y - step * grad, contact, config)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = u_new + ((t - 1.0) / t_new) * (u_new - u)
        return (u_new, y_new, t_new), None

    (u, _, _), _ = jax.lax.scan(
        fista, (u0, u0, jnp.asarray(1.0, dtype)), None,
        length=config.solver_iterations,
    )
    # first-step forces (reference returns qp_solution first 3*num_legs too)
    return u[: 3 * config.num_legs].reshape(config.num_legs, 3)
