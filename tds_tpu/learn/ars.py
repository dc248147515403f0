"""Augmented Random Search, TPU-native.

Functional re-design of the reference trainer (examples/ars/ars_learner.h,
ars_vectorized_worker.h, ars_config.h):

- the 25M-entry SharedNoiseTable becomes jax.random.normal keyed per
  iteration (deterministic, no table storage)
- +-delta rollouts run as one vmapped, jitted scan over the horizon with the
  policy fused into the physics step (no per-step host feedback — the design
  goal the reference's CUDA path approximates, cuda_codegen.cpp:316-319)
- reward accumulation freezes at done (ars_vectorized_worker.h:113-133)
- observation filter: raw observations push into Welford stats during
  rollouts, normalization applies the *previous* iteration's frozen stats
  (ars_learner.h:205-224); stats merge associatively (psum-able)
- update: w += step_size * mean((r+ - r-) * delta_unit) * delta_std
  (ars_learner.h:67-90,185-190)
"""

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from tds_tpu.learn.nn import MLPSpec
from tds_tpu.learn.running_stat import RunningStat


class ARSConfig(NamedTuple):
    """Defaults per ars_config.h:4-16."""

    num_directions: int = 128  # batch_size: parallel +- rollout pairs
    rollout_length: int = 3000
    delta_std: float = 0.03
    step_size: float = 0.02  # sgd_step_size
    shift: float = 0.0  # per-step reward shift
    eval_interval: int = 10
    # ARS-v2 reward normalization (Mania et al. 2018): divide direction
    # rewards by their std before the weighted sum. The reference carries
    # the machinery but ships it disabled (ars_vectorized_worker.h:173,
    # use_std_deviation=false); enabled here by default because it makes
    # step_size robust to reward scale.
    scale_by_reward_std: bool = True
    # ARS V1-t/V2-t (Mania et al. 2018, Alg. 2 line 6): update from only
    # the top_directions by max(r+, r-), with sigma_R computed over the
    # selected 2b rewards. 0 = use all directions (the reference's
    # weighted_sum_custom behavior). Without selection, a few walking
    # directions drown in the noise of ~everything else on hard tasks.
    top_directions: int = 0


@struct.dataclass
class ARSState:
    params: jnp.ndarray  # flat policy parameters
    obs_stat: RunningStat
    key: jnp.ndarray
    iteration: jnp.ndarray
    total_timesteps: jnp.ndarray


def init_ars(env, policy: MLPSpec, key, dtype=jnp.float32) -> ARSState:
    return ARSState(
        params=jnp.zeros((policy.num_parameters,), dtype),
        obs_stat=RunningStat.create(env.observation_dim, dtype),
        key=key,
        iteration=jnp.zeros((), jnp.int32),
        total_timesteps=jnp.zeros((), jnp.int32),
    )


def _rollout_with_stats(env, policy: MLPSpec, params, obs_stat, key, config):
    """One rollout; returns (total_reward, steps, local obs stats triple)."""
    state, obs = env.reset(key)
    dtype = obs.dtype
    dim = obs.shape[-1]
    init = (
        state,
        obs,
        jnp.zeros((), dtype),  # total reward
        jnp.ones((), dtype),  # alive
        jnp.zeros((), dtype),  # steps
        jnp.zeros((dim,), dtype),  # obs sum
        jnp.zeros((dim,), dtype),  # obs sumsq
    )

    def step(carry, _):
        state, obs, total, alive, steps, s1, s2 = carry
        # a diverged simulation (NaN/Inf state) must not poison the update:
        # gate the rollout as terminated and keep the statistics finite
        finite = jnp.all(jnp.isfinite(obs)).astype(dtype)
        obs_safe = jnp.where(jnp.isfinite(obs), obs, 0.0)
        alive = alive * finite
        s1 = s1 + obs_safe * alive
        s2 = s2 + obs_safe * obs_safe * alive
        action = env.action_transform(
            policy.apply(params, obs_stat.normalize(obs_safe))
        )
        state, obs, reward, done = env.step(state, action)
        reward = jnp.nan_to_num(reward, nan=0.0, posinf=0.0, neginf=0.0)
        total = total + (reward - config.shift) * alive
        steps = steps + alive
        alive = alive * (1.0 - done.astype(dtype))
        return (state, obs, total, alive, steps, s1, s2), None

    (state, obs, total, alive, steps, s1, s2), _ = jax.lax.scan(
        step, init, None, length=config.rollout_length
    )
    return total, steps, (s1, s2, steps)


def make_train_step(
    env, policy: MLPSpec, config: ARSConfig, mesh=None
) -> Callable:
    """Returns a jitted function state -> (state, metrics). All rollouts of
    one iteration run as a single compiled program. With ``mesh`` given, the
    direction batch is sharded across devices (tds_tpu.parallel) and XLA
    turns the g_hat/obs-stat reductions into cross-chip collectives."""

    def iteration(state: ARSState):
        from tds_tpu.parallel.mesh import constrain_batch

        key, k_delta, k_env = jax.random.split(state.key, 3)
        n = config.num_directions
        p = state.params.shape[0]
        deltas = jax.random.normal(k_delta, (n, p), state.params.dtype)
        deltas = constrain_batch(deltas, mesh)
        w_pos = state.params + config.delta_std * deltas
        w_neg = state.params - config.delta_std * deltas
        env_keys = constrain_batch(jax.random.split(k_env, n), mesh)

        def run(w, k):
            return _rollout_with_stats(
                env, policy, w, state.obs_stat, k, config
            )

        r_pos, steps_pos, stats_pos = jax.vmap(run)(w_pos, env_keys)
        r_neg, steps_neg, stats_neg = jax.vmap(run)(w_neg, env_keys)

        weights = r_pos - r_neg
        if config.top_directions and config.top_directions < n:
            b = int(config.top_directions)
            score = jnp.maximum(r_pos, r_neg)
            _, idx = jax.lax.top_k(score, b)
            sel = jnp.zeros((n,), weights.dtype).at[idx].set(1.0)
            if config.scale_by_reward_std:
                # std over the 2b selected rewards (ARS paper sigma_R)
                r_sel = jnp.concatenate([r_pos[idx], r_neg[idx]])
                sigma_r = jnp.maximum(jnp.std(r_sel), 1e-6)
                weights = weights / sigma_r
            g_hat = (
                jnp.sum((weights * sel)[:, None] * deltas, axis=0) / b
            ) * config.delta_std
        else:
            if config.scale_by_reward_std:
                r_all = jnp.concatenate([r_pos, r_neg])
                sigma_r = jnp.maximum(jnp.std(r_all), 1e-6)
                weights = weights / sigma_r
            g_hat = (
                jnp.mean(weights[:, None] * deltas, axis=0) * config.delta_std
            )
        params = state.params + config.step_size * g_hat

        # merge observation stats (sum/sumsq accumulation -> Welford merge)
        def to_stat(stats):
            s1, s2, cnt = stats
            s1 = jnp.sum(s1, axis=0)
            s2 = jnp.sum(s2, axis=0)
            total = jnp.sum(cnt)
            safe = jnp.maximum(total, 1.0)
            mean = s1 / safe
            m2 = s2 - safe * mean**2
            return RunningStat(total.astype(state.obs_stat.count.dtype), mean, m2)

        obs_stat = state.obs_stat.merge(to_stat(stats_pos)).merge(
            to_stat(stats_neg)
        )

        new_state = ARSState(
            params=params,
            obs_stat=obs_stat,
            key=key,
            iteration=state.iteration + 1,
            total_timesteps=state.total_timesteps
            + (jnp.sum(steps_pos) + jnp.sum(steps_neg)).astype(jnp.int32),
        )
        metrics = {
            "reward_pos_mean": jnp.mean(r_pos),
            "reward_neg_mean": jnp.mean(r_neg),
            "reward_max": jnp.maximum(jnp.max(r_pos), jnp.max(r_neg)),
            "g_hat_norm": jnp.linalg.norm(g_hat),
        }
        return new_state, metrics

    return jax.jit(iteration)


def make_eval(env, policy: MLPSpec, config: ARSConfig, num_rollouts: int = 16):
    """Evaluation rollouts with the unperturbed policy, no reward shift
    (ars_vectorized_worker.h:174-207)."""

    def evaluate(state: ARSState, key):
        keys = jax.random.split(key, num_rollouts)
        eval_cfg = config._replace(shift=0.0)

        def run(k):
            total, steps, _ = _rollout_with_stats(
                env, policy, state.params, state.obs_stat, k, eval_cfg
            )
            return total, steps

        rewards, steps = jax.vmap(run)(keys)
        return {
            "eval_reward_mean": jnp.mean(rewards),
            "eval_reward_min": jnp.min(rewards),
            "eval_reward_max": jnp.max(rewards),
            "eval_steps_mean": jnp.mean(steps),
        }

    return jax.jit(evaluate)


def train(
    env,
    policy: MLPSpec,
    config: ARSConfig,
    num_iterations: int,
    key=None,
    log_fn=None,
    eval_fn_num_rollouts: int = 16,
):
    """Driver loop (analog of ARSLearner::train, ars_learner.h:194-330)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    key, sub = jax.random.split(key)
    state = init_ars(env, policy, sub)
    step_fn = make_train_step(env, policy, config)
    eval_fn = make_eval(env, policy, config, eval_fn_num_rollouts)
    history = []
    for it in range(num_iterations):
        state, metrics = step_fn(state)
        if (it + 1) % config.eval_interval == 0:
            key, sub = jax.random.split(key)
            metrics.update(eval_fn(state, sub))
        history.append({k: float(v) for k, v in metrics.items()})
        if log_fn:
            log_fn(it, history[-1])
    return state, history
