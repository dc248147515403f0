"""Raibert-heuristic swing-leg controller, traceable.

Port of examples/whole_body_control/raibert_swing_leg_controller.hpp:22-180:
foot placement = hip + v*T_stance/2 - kp*(v_des - v), parabolic swing
trajectory with phase warping (fast first half via 0.8*sin(pi*phase)).
"""

from typing import NamedTuple

import jax.numpy as jnp

from tds_tpu.control.mpc.gait import SWING

KP_RAIBERT = 0.1  # raibert_swing_leg_controller.hpp:24
MAX_CLEARANCE = 0.1  # :168


def swing_phase_warp(input_phase):
    """phase <= 0.5: 0.8*sin(pi*phase); else 0.8 + (phase-0.5)*0.4 (:159-164)."""
    return jnp.where(
        input_phase <= 0.5,
        0.8 * jnp.sin(input_phase * jnp.pi),
        0.8 + (input_phase - 0.5) * 0.4,
    )


def gen_parabola(phase, start, mid, end):
    """Point on the parabola through (0,start), (0.5,mid), (1,end) (:175-190)."""
    mid_phase = 0.5
    d1 = mid - start
    d2 = end - start
    d3 = mid_phase**2 - mid_phase
    a = (d1 - d2 * mid_phase) / d3
    b = d2 - a
    c = start
    return a * phase**2 + b * phase + c


def swing_foot_trajectory(input_phase, start_pos, end_pos):
    """Interpolated swing foot position in base frame (:156-173)."""
    phase = swing_phase_warp(input_phase)
    xy = (1.0 - phase)[..., None] * start_pos[..., 0:2] + phase[..., None] * end_pos[
        ..., 0:2
    ]
    mid = jnp.maximum(end_pos[..., 2], start_pos[..., 2]) + MAX_CLEARANCE
    z = gen_parabola(phase, start_pos[..., 2], mid, end_pos[..., 2])
    return jnp.concatenate([xy, z[..., None]], axis=-1)


def raibert_foot_targets(
    com_velocity_body,
    yaw_rate,
    hip_positions,  # (num_legs, 3) in base frame
    stance_duration,  # (num_legs,)
    desired_speed,  # (3,)
    desired_twisting_speed,
    desired_height,  # standing height minus foot clearance
):
    """Raibert landing targets in base frame (:64-107)."""
    v = com_velocity_body.at[..., 2].set(0.0)
    twisting = jnp.stack(
        [-hip_positions[..., 1], hip_positions[..., 0], jnp.zeros_like(hip_positions[..., 0])],
        axis=-1,
    )
    hip_vel = v[None, :] + yaw_rate * twisting
    target_hip_vel = desired_speed[None, :] + desired_twisting_speed * twisting
    target = (
        hip_vel * stance_duration[:, None] / 2.0
        - KP_RAIBERT * (target_hip_vel - hip_vel)
    )
    target = target.at[..., 0].add(hip_positions[..., 0])
    target = target.at[..., 1].add(hip_positions[..., 1])
    target = target.at[..., 2].add(-desired_height)
    return target


class SwingLegState(NamedTuple):
    last_leg_state: jnp.ndarray  # (num_legs,) int
    phase_switch_foot_position: jnp.ndarray  # (num_legs, 3) base frame

    @staticmethod
    def create(initial_leg_state, foot_positions):
        return SwingLegState(
            last_leg_state=jnp.asarray(initial_leg_state),
            phase_switch_foot_position=jnp.asarray(foot_positions),
        )


def swing_leg_update(
    state: SwingLegState, desired_leg_state, foot_positions_base
) -> SwingLegState:
    """Latch takeoff foot positions on STANCE->SWING transitions (:48-61)."""
    switched = (desired_leg_state == SWING) & (
        state.last_leg_state != desired_leg_state
    )
    latched = jnp.where(
        switched[:, None], foot_positions_base, state.phase_switch_foot_position
    )
    return SwingLegState(
        last_leg_state=desired_leg_state, phase_switch_foot_position=latched
    )


def swing_foot_positions(
    state: SwingLegState,
    normalized_phase,
    foot_targets,
):
    """Current swing foot position command per leg (base frame)."""
    return swing_foot_trajectory(
        normalized_phase, state.phase_switch_foot_position, foot_targets
    )
