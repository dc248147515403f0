"""Environment API: pure reset/step functions over an EnvState pytree.

The reference's envs are stateful C++ structs with reset/step/
compute_reward_done (e.g. examples/environments/cartpole_environment2.h,
laikago_environment2.h); here each env is a static description object with

    reset(key)          -> (EnvState, obs)
    step(state, action) -> (EnvState, obs, reward, done)

Both are jit/vmap/grad-compatible; batching and auto-reset live in
tds_tpu.envs.vectorized.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EnvState:
    q: jnp.ndarray
    qd: jnp.ndarray
    t: jnp.ndarray  # step counter
    key: jnp.ndarray  # PRNG key for stochastic resets


class Env:
    """Protocol; concrete envs implement these."""

    observation_dim: int
    action_dim: int

    def reset(self, key) -> Tuple[EnvState, jnp.ndarray]:
        raise NotImplementedError

    def step(self, state: EnvState, action):
        raise NotImplementedError

    def action_transform(self, raw_action):
        """Map raw policy outputs to env actions. Identity by default; e.g.
        cartpole clips to [-1, 1] and rescales to the force range
        (cartpole_environment2.h:288-321)."""
        return raw_action
