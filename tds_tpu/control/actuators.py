"""Actuator models: gear/limit base, series-elastic, position servo,
actuator-net (Hwangbo et al. 2019).

Functional redesign of src/tiny_actuator.h:31-331: each actuator is a pure
function ``(state, q, qd, u) -> (tau, new_state)`` so it drops into jitted
env steps; stateless actuators carry an empty state pytree.
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp

from tds_tpu.learn.nn import Activation, MLPSpec


def _apply_limits(tau, limits):
    if limits is None:
        return tau
    limits = jnp.asarray(limits, dtype=tau.dtype)
    return jnp.clip(tau, -limits, limits)


class DirectActuator(NamedTuple):
    """tau = u / gear_ratio, clamped (tiny_actuator.h:70-86)."""

    gear_ratios: Optional[jnp.ndarray] = None
    limits: Optional[jnp.ndarray] = None

    def compute_torques(self, state, q, qd, u):
        tau = u if self.gear_ratios is None else u / self.gear_ratios
        return _apply_limits(tau, self.limits), state

    def init_state(self, dof, dtype=jnp.float32):
        return ()


class SeriesElasticActuator(NamedTuple):
    """Motor + gearbox + spring; control input = motor velocity, internal
    state = gear positions (tiny_actuator.h:127-211, after ethz-adrl
    control-toolbox)."""

    spring_k: float = 1.0
    gear_ratios: Optional[jnp.ndarray] = None
    limits: Optional[jnp.ndarray] = None

    def init_state(self, dof, dtype=jnp.float32):
        return jnp.zeros((dof,), dtype)

    def compute_torques(self, gear_positions, q, qd, u):
        tau = (gear_positions - q) * self.spring_k
        return _apply_limits(tau, self.limits), gear_positions

    def integrate(self, gear_positions, q, qd, u, dt):
        """gear_pos += dt * u / gear_ratio (tiny_actuator.h:181-206)."""
        ratios = 1.0 if self.gear_ratios is None else self.gear_ratios
        return gear_positions + dt * u / ratios


class ServoActuator(NamedTuple):
    """Position servo: PD toward target positions u (tiny_actuator.h:214-259)."""

    kp: float
    kd: float
    min_force: float
    max_force: float
    limits: Optional[jnp.ndarray] = None

    def init_state(self, dof, dtype=jnp.float32):
        return ()

    def compute_torques(self, state, q, qd, u):
        tau = self.kp * (u - q) - self.kd * qd
        tau = jnp.clip(tau, self.min_force, self.max_force)
        return _apply_limits(tau, self.limits), state


class ActuatorNetSpec:
    """Neural servo from position-error/velocity history
    (tiny_actuator.h:262-331): MLP softsign 32-32-32 -> dof."""

    def __init__(self, history_size: int, dof: int):
        self.history_size = history_size
        self.dof = dof
        self.network = MLPSpec(
            history_size * 2 * dof,
            [32, 32, 32, dof],
            [
                Activation.SOFTSIGN,
                Activation.SOFTSIGN,
                Activation.SOFTSIGN,
                Activation.IDENTITY,
            ],
        )

    def init_state(self, dtype=jnp.float32):
        """History ring buffer of (position error, velocity) pairs."""
        return jnp.zeros((self.history_size, 2 * self.dof), dtype)

    def compute_torques(self, params, history, q, qd, u):
        """u holds the target joint positions; history shifts in the newest
        (error, qd) sample before inference."""
        sample = jnp.concatenate([u - q, qd], axis=-1)
        history = jnp.concatenate([history[1:], sample[None, :]], axis=0)
        tau = self.network.apply(params, history.reshape(-1))
        return tau, history
