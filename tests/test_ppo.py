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
