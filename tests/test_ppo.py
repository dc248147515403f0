"""PPO learner test: solves cartpole balance."""

import jax
import jax.numpy as jnp

from tds_tpu.envs.cartpole import CartpoleEnv
from tds_tpu.learn.ppo import PPOConfig, PPONetworks, make_ppo


def _eval_deterministic(env, nets, state, n=300):
    s, obs = env.reset(jax.random.PRNGKey(123))

    def body(carry, _):
        s, obs, total, alive = carry
        obs_n = state.obs_stat.normalize(obs)
        mean = nets.policy.apply(state.params["policy"], obs_n)
        s, obs, r, d = env.step(s, env.action_transform(mean))
        total = total + r * alive
        alive = alive * (1.0 - d.astype(obs.dtype))
        return (s, obs, total, alive), None

    (_, _, total, _), _ = jax.lax.scan(
        body, (s, obs, jnp.asarray(0.0), jnp.asarray(1.0)), None, length=n
    )
    return float(total)


def test_ppo_improves_cartpole():
    env = CartpoleEnv()
    nets = PPONetworks(env.observation_dim, env.action_dim, hidden=(32, 32))
    cfg = PPOConfig(
        num_envs=32, unroll_length=64, learning_rate=1e-3, num_epochs=4,
        entropy_cost=1e-4, init_log_std=-1.0,
    )
    init_fn, step_fn = make_ppo(env, nets, cfg)
    state = init_fn(jax.random.PRNGKey(0))
    before = _eval_deterministic(env, nets, state)
    for _ in range(80):
        state, metrics = step_fn(state)
    after = _eval_deterministic(env, nets, state)
    assert after > before + 50, (before, after)


def test_ppo_lr_anneal_runs_and_freezes_late_policy():
    """lr_anneal_iterations (round 5): the linear schedule must count
    num_epochs*num_minibatches optimizer updates per training iteration,
    reach ~0 by the end, and leave the policy essentially frozen over the
    final iterations (the mechanism that stops the late deterministic-mean
    collapse the ant PPO run documented)."""
    env = CartpoleEnv()
    nets = PPONetworks(env.observation_dim, env.action_dim, hidden=(16, 16))
    cfg = PPOConfig(
        num_envs=8, unroll_length=32, learning_rate=1e-3,
        lr_anneal_iterations=10,
    )
    init_fn, step_fn = make_ppo(env, nets, cfg)
    state = init_fn(jax.random.PRNGKey(0))

    def max_delta(a, b):
        return max(
            float(jnp.max(jnp.abs(x - y)))
            for x, y in zip(jax.tree_util.tree_leaves(a),
                            jax.tree_util.tree_leaves(b))
        )

    p0 = state.params["policy"]
    state, _ = step_fn(state)  # iteration 1: full learning rate
    early = max_delta(state.params["policy"], p0)
    for _ in range(8):
        state, _ = step_fn(state)
    before = state.params["policy"]
    state, _ = step_fn(state)  # final iteration: lr ramps lr/10 -> 0
    late = max_delta(state.params["policy"], before)
    # The final iteration's updates average ~lr/20 (linear ramp to zero),
    # so its TOTAL movement must be far below the first iteration's —
    # relative, not absolute: Adam still takes ~lr-sized steps until the
    # schedule actually reaches zero on the very last minibatch.
    assert late < early / 5, (early, late)
    assert late < 5e-3, (early, late)
