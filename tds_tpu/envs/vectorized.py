"""Vectorized environments: vmapped batch stepping with auto-reset.

Replaces the reference's Serial/OpenMP/CUDA steppers
(examples/ars/ars_vectorized_environment.h:68-161) with one code path:
``jit(vmap(step))``; auto-reset on done mirrors
ars_vectorized_environment.h:252-281. Multi-chip sharding of the batch axis
lives in tds_tpu.parallel.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from tds_tpu.envs.base import Env, EnvState


class VectorizedEnv:
    def __init__(self, env: Env, num_envs: int, auto_reset: bool = True):
        self.env = env
        self.num_envs = num_envs
        self.auto_reset = auto_reset
        self._reset = jax.vmap(env.reset)
        self._step = jax.vmap(env.step)

    def reset(self, key):
        keys = jax.random.split(key, self.num_envs)
        return self._reset(keys)

    def step(self, states: EnvState, actions):
        new_states, obs, reward, done = self._step(states, actions)
        if self.auto_reset:
            new_states, obs = self._auto_reset(new_states, obs, done)
        return new_states, obs, reward, done

    def _auto_reset(self, states: EnvState, obs, done):
        def maybe_reset(state, ob, d):
            key, sub = jax.random.split(state.key)

            def do_reset(_):
                s, o = self.env.reset(sub)
                return s.replace(key=key), o

            def keep(_):
                return state, ob

            return jax.lax.cond(d, do_reset, keep, None)

        return jax.vmap(maybe_reset)(states, obs, done)


def rollout(env: Env, policy_fn, params, key, num_steps: int):
    """Single-env rollout as one on-device scan: policy + physics fused
    (the design that removes the reference's per-step host feedback loop,
    examples/ars/cuda_codegen.cpp:316-319).

    ``policy_fn(params, obs) -> action``. Returns (total_reward,
    steps_alive) — steps_alive is the episode length in steps (it used to
    return the terminal 0/1 alive flag, which averaged across rollouts
    reads as 'fraction that never terminated', not mean episode length).
    """
    state, obs = env.reset(key)

    def step(carry, _):
        state, obs, total, alive, steps = carry
        action = env.action_transform(policy_fn(params, obs))
        state, obs, reward, done = env.step(state, action)
        total = total + reward * alive
        steps = steps + alive
        alive = alive * (1.0 - done.astype(obs.dtype))
        return (state, obs, total, alive, steps), None

    init = (
        state, obs, jnp.zeros((), obs.dtype), jnp.ones((), obs.dtype),
        jnp.zeros((), obs.dtype),
    )
    (state, obs, total, alive, steps), _ = jax.lax.scan(
        step, init, None, length=num_steps
    )
    return total, steps
