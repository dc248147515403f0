"""Open-loop gait scheduling + COM velocity estimation, traceable.

Ports examples/whole_body_control/openloop_gait_generator.hpp:44-160 and
com_velocity_estimator.hpp:28-130 as pure functions of time/state so the
whole MPC control loop jits and batches. Leg states are integers:
SWING=0, STANCE=1, EARLY_CONTACT=2, LOSE_CONTACT=3 (enum order per the
reference's LegState).
"""

from typing import NamedTuple, Sequence

import jax.numpy as jnp

SWING, STANCE, EARLY_CONTACT, LOSE_CONTACT = 0, 1, 2, 3

# laikago trot defaults (openloop_gait_generator.hpp table constants)
NOMINAL_STANCE_DURATION = (0.3, 0.3, 0.3, 0.3)
NOMINAL_DUTY_FACTOR = (0.6, 0.6, 0.6, 0.6)
INITIAL_LEG_PHASE = (0.9, 0.0, 0.0, 0.9)
TROTTING_INIT_STATE = (SWING, STANCE, STANCE, SWING)
CONTACT_DETECTION_PHASE_THRESHOLD = 0.1


class GaitConfig(NamedTuple):
    stance_duration: jnp.ndarray  # (num_legs,)
    duty_factor: jnp.ndarray
    initial_leg_phase: jnp.ndarray
    initial_leg_state: jnp.ndarray  # int (num_legs,)
    contact_detection_phase_threshold: float = CONTACT_DETECTION_PHASE_THRESHOLD

    @staticmethod
    def laikago_trotting():
        return GaitConfig(
            stance_duration=jnp.asarray(NOMINAL_STANCE_DURATION),
            duty_factor=jnp.asarray(NOMINAL_DUTY_FACTOR),
            initial_leg_phase=jnp.asarray(INITIAL_LEG_PHASE),
            initial_leg_state=jnp.asarray(TROTTING_INIT_STATE),
        )


class GaitState(NamedTuple):
    desired_leg_state: jnp.ndarray  # (num_legs,) int
    leg_state: jnp.ndarray  # int, contact-corrected
    normalized_phase: jnp.ndarray  # (num_legs,) in [0,1)


def gait_update(config: GaitConfig, current_time, foot_contacts) -> GaitState:
    """Phase scheduling + early/lost contact detection
    (openloop_gait_generator.hpp:91-125), branchless."""
    full_cycle = config.stance_duration / config.duty_factor
    augmented = current_time + config.initial_leg_phase * full_cycle
    phase_in_cycle = jnp.mod(augmented, full_cycle) / full_cycle
    init_is_swing = config.initial_leg_state == SWING
    ratio = jnp.where(init_is_swing, 1.0 - config.duty_factor, config.duty_factor)
    in_initial = phase_in_cycle < ratio
    next_state = jnp.where(init_is_swing, STANCE, SWING)
    desired = jnp.where(in_initial, config.initial_leg_state, next_state)
    phase = jnp.where(
        in_initial,
        phase_in_cycle / ratio,
        (phase_in_cycle - ratio) / (1.0 - ratio),
    )
    # contact corrections after the detection threshold
    detect = phase >= config.contact_detection_phase_threshold
    contacts = jnp.asarray(foot_contacts)
    state = desired
    state = jnp.where(detect & (desired == SWING) & contacts, EARLY_CONTACT, state)
    state = jnp.where(detect & (desired == STANCE) & (~contacts), LOSE_CONTACT, state)
    return GaitState(
        desired_leg_state=desired, leg_state=state, normalized_phase=phase
    )


def swing_duration(config: GaitConfig):
    return config.stance_duration / config.duty_factor - config.stance_duration


class VelocityFilterState(NamedTuple):
    """Moving-window average over the last W samples
    (com_velocity_estimator.hpp MovingWindowFilter as a ring buffer)."""

    buffer: jnp.ndarray  # (window, 3)
    count: jnp.ndarray  # ()

    @staticmethod
    def create(window: int = 20, dtype=jnp.float32):
        return VelocityFilterState(
            buffer=jnp.zeros((window, 3), dtype), count=jnp.zeros((), jnp.int32)
        )

    def update(self, velocity):
        buf = jnp.concatenate([self.buffer[1:], velocity[None, :]], axis=0)
        count = jnp.minimum(self.count + 1, buf.shape[0])
        avg = jnp.sum(buf, axis=0) / jnp.maximum(count, 1)
        return VelocityFilterState(buf, count), avg
