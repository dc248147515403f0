"""The committed ARS checkpoint must actually walk (VERDICT round-1 gap #2:
"the flagship robot has never actually learned to walk").

logs/laikago_ars/policy_r2b.pkl is a linear policy trained with ARS V2-t
(128 directions x 3000 steps, top-32 selection) on the laikago contact env;
at commit time it covers ~5.4 m in 3 s of simulation. The test replays it
for 1000 steps and requires sustained forward progress while upright.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

CKPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "logs", "laikago_ars", "policy_r2b.pkl",
)


@pytest.mark.skipif(not os.path.exists(CKPT), reason="checkpoint not present")
def test_trained_laikago_policy_walks():
    from tds_tpu.envs.laikago import LaikagoEnv
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

    env = LaikagoEnv(dtype=jnp.float32)
    policy = linear_policy(env.observation_dim, env.action_dim)

    @jax.jit
    def rollout(key):
        st, obs = env.reset(key)

        def step(carry, _):
            st, obs, total, alive = carry
            action = env.action_transform(
                policy.apply(params, obs_stat.normalize(obs))
            )
            st, obs, reward, done = env.step(st, action)
            total = total + reward * alive
            alive = alive * (1.0 - done.astype(obs.dtype))
            return (st, obs, total, alive), None

        (st, obs, total, alive), _ = jax.lax.scan(
            step, (st, obs, jnp.zeros((), obs.dtype), jnp.ones((), obs.dtype)),
            None, length=2000,
        )
        return total, st.q, alive

    total, q_final, alive = rollout(jax.random.PRNGKey(123))
    x = float(q_final[0])
    z = float(q_final[2])
    # thresholds pinned to within ~2x of the committed policy's measured
    # actuals (x=3.03 m, reward=2218 over 2000 steps, seeds 123/7 within
    # 1.5%) so a physics regression that halves gait speed fails loudly
    assert float(alive) == 1.0, "policy fell within 2000 steps"
    assert x > 1.6, f"gait too slow: x={x:.3f} m in 2 s (expected ~3.0)"
    assert 0.3 < z < 0.6, f"bad height: z={z:.3f}"
    assert float(total) > 1100.0, (
        f"cumulative reward {float(total):.1f} (expected ~2200)"
    )
