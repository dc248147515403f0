"""The committed humanoid ARS checkpoint must move FORWARD.

logs/humanoid_ars/policy_curr2.pkl is a linear policy trained with ARS
V2-t (128 directions, top-32) on the spherical-joint humanoid env at the
reference's spec — kp=50/kd=1.5/max_force=50, reward = torso x while
upright (humanoid_environment.h:73-78,155-196; trainer analog
examples/ars/ars_train_policy.cpp). Its lineage is a CURRICULUM, all
on-chip: 1100 iters at 3000-step rollouts (policy_r4b), then 2000 cheap
iters at the reference's own 400-step training-rollout length
(ars_train_policy.cpp:379) which buys a faster gait, then ~600 iters of
3000-step consolidation that fuses the speed with survival — eval reward
549 (r4b) -> 1099+, a 2x jump the long-rollout regime alone plateaued
under.

At commit time on the 4 probed seeds: x 0.86-1.70 m forward (0.59-1.04
m/s), falls at 1.46-1.75 s, rewards 847-1377 (policy_r4b, kept for
history, measured x 1.11-1.29 / rewards 489-648).

This is a forward-displacement gate (round-3 review demand: walking, not
standing): thresholds sit ~20-30% under the measured actuals so physics
or PD regressions that destabilize the gait fail loudly, while ARS seed
noise cannot flake it.
"""

import functools
import os

import jax
import jax.numpy as jnp
import pytest

CKPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "logs", "humanoid_ars", "policy_curr2.pkl",
)


@pytest.mark.skipif(not os.path.exists(CKPT), reason="checkpoint not present")
def test_trained_humanoid_policy_walks_forward():
    from tds_tpu.envs.humanoid import HumanoidEnv
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

    env = HumanoidEnv(dtype=jnp.float32)
    policy = linear_policy(env.observation_dim, env.action_dim)

    @functools.partial(jax.jit, static_argnums=1)
    def rollout(key, length):
        st, obs = env.reset(key)

        def step(carry, _):
            st, obs, total, alive, steps, x = carry
            action = env.action_transform(
                policy.apply(params, obs_stat.normalize(obs))
            )
            st, obs, reward, done = env.step(st, action)
            total = total + reward * alive
            steps = steps + alive
            pos, _ = env.base_pose_xyz_rpy(st.q)
            x = jnp.where(alive > 0, pos[0], x)
            alive = alive * (1.0 - done.astype(obs.dtype))
            return (st, obs, total, alive, steps, x), None

        z = jnp.zeros((), jnp.float32)
        (st, obs, total, alive, steps, x), _ = jax.lax.scan(
            step, (st, obs, z, jnp.ones((), jnp.float32), z, z),
            None, length=length,
        )
        return total, steps, x

    for seed in (0, 7, 123, 42):
        total, steps, x = rollout(jax.random.PRNGKey(seed), 3000)
        # measured at commit time: x 0.86-1.70 m, alive 1456-1754 steps,
        # reward 847-1377
        assert float(x) > 0.65, (
            f"seed {seed}: only {float(x):.2f} m forward (measured >=0.86)"
        )
        assert float(steps) >= 1100, (
            f"seed {seed}: fell after {float(steps):.0f} steps (measured >=1456)"
        )
        assert float(total) > 600.0, (
            f"seed {seed}: reward {float(total):.1f} (measured 847-1377)"
        )
