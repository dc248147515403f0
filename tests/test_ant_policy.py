"""The committed ant ARS checkpoint must walk.

logs/ant_ars/policy.pkl is a linear policy trained on-chip with ARS V2-t
(128 directions, top-32, 1000-step rollouts, 300 iterations) on the ant
contact env at the reference's spec — kp=15/kd=0.3/max_force=3, reward =
forward velocity, done when z < 0.26 (ant_environment2.h:54-106; trainer
analog examples/ars/ars_train_policy.cpp, which trains ant as one of its
three flagship robots). At commit time it covers 13.0-13.5 m in 10 s
(1.3 m/s) without falling, on all 4 probed seeds.

Thresholds sit ~30% under the measured actuals so physics or PD
regressions fail loudly while ARS seed noise cannot flake the gate.
"""

import functools
import os

import jax
import jax.numpy as jnp
import pytest

CKPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "logs", "ant_ars", "policy.pkl",
)


@pytest.mark.skipif(not os.path.exists(CKPT), reason="checkpoint not present")
def test_trained_ant_policy_walks():
    from tds_tpu.envs.ant import AntEnv
    from tds_tpu.learn.nn import linear_policy
    from tds_tpu.learn.running_stat import RunningStat
    from tds_tpu.utils.checkpoint import load_checkpoint

    saved, _ = load_checkpoint(CKPT)
    params = jnp.asarray(saved["params"], jnp.float32)
    obs_stat = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), saved["obs_stat"]
    )
    if not isinstance(obs_stat, RunningStat):
        obs_stat = RunningStat(*obs_stat)

    env = AntEnv(dtype=jnp.float32)
    policy = linear_policy(env.observation_dim, env.action_dim)

    @functools.partial(jax.jit, static_argnums=1)
    def rollout(key, length):
        st, obs = env.reset(key)
        x0 = st.q[0]

        def step(carry, _):
            st, obs, alive, steps, x = carry
            action = env.action_transform(
                policy.apply(params, obs_stat.normalize(obs))
            )
            st, obs, _reward, done = env.step(st, action)
            steps = steps + alive
            x = jnp.where(alive > 0, st.q[0], x)
            alive = alive * (1.0 - done.astype(obs.dtype))
            return (st, obs, alive, steps, x), None

        (st, obs, alive, steps, x), _ = jax.lax.scan(
            step,
            (st, obs, jnp.ones((), jnp.float32), jnp.zeros((), jnp.float32), x0),
            None, length=length,
        )
        return steps, x - x0

    for seed in (0, 7, 123, 42):
        steps, x = rollout(jax.random.PRNGKey(seed), 1000)
        # measured at commit time: x 13.0-13.5 m, alive 1000/1000 steps
        assert float(steps) >= 900, (
            f"seed {seed}: fell after {float(steps):.0f} steps (measured 1000)"
        )
        assert float(x) > 9.0, (
            f"seed {seed}: only {float(x):.2f} m forward (measured >=13.0)"
        )
