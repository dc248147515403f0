"""Gymnasium-compatible wrappers (the reference's tds_environments analog).

Wraps any tds_tpu Env (pure reset/step) in the standard stateful
Gymnasium API so the envs drop into external RL libraries. Single-env and
(numpy-boundary) vector variants; the jitted step is cached per env.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    import gymnasium
    from gymnasium import spaces
except ImportError:  # pragma: no cover
    gymnasium = None
    spaces = None


class GymEnv(gymnasium.Env if gymnasium else object):
    metadata = {"render_modes": ["rgb_array"]}

    def __init__(self, env, max_episode_steps: int = 1000, seed: int = 0,
                 action_limit: float = 1.0):
        self._env = env
        self._max_steps = max_episode_steps
        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self._steps = 0
        if spaces is not None:
            big = np.inf
            self.observation_space = spaces.Box(
                -big, big, shape=(env.observation_dim,), dtype=np.float32
            )
            self.action_space = spaces.Box(
                -action_limit, action_limit, shape=(env.action_dim,),
                dtype=np.float32,
            )
        self._reset_fn = jax.jit(env.reset)
        self._step_fn = jax.jit(env.step)

    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, sub = jax.random.split(self._key)
        self._state, obs = self._reset_fn(sub)
        self._steps = 0
        return np.asarray(obs, np.float32), {}

    def step(self, action):
        action = jnp.asarray(action)
        self._state, obs, reward, done = self._step_fn(self._state, action)
        self._steps += 1
        truncated = self._steps >= self._max_steps
        return (
            np.asarray(obs, np.float32),
            float(reward),
            bool(done),
            truncated,
            {},
        )

    def render(self):
        raise NotImplementedError(
            "use tds_tpu.visualizer.renderer for offscreen frames"
        )
