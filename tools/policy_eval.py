#!/usr/bin/env python
"""Evaluate a trained checkpoint on the reference reward: per-seed forward
displacement, survival steps and (unshaped) reward over a given horizon.

Works for ARS linear-policy checkpoints ({params, obs_stat}) and PPO
checkpoints ({params: {policy, value, log_std}, obs_stat, hidden}),
dispatched on the saved structure. Always evaluates the env's DEFAULT
(reference) reward — training-time shaping knobs are not applied here.

Run: PYTHONPATH=.:/root/.axon_site python tools/policy_eval.py \
         logs/humanoid_ars/policy_r5.pkl --env humanoid --length 3000
"""

import argparse
import functools
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tds_tpu_jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_env(name):
    from tds_tpu.envs.ant import AntEnv
    from tds_tpu.envs.hopper import HalfCheetahEnv, HopperEnv
    from tds_tpu.envs.humanoid import HumanoidEnv
    from tds_tpu.envs.laikago import LaikagoEnv

    return {
        "laikago": LaikagoEnv,
        "humanoid": HumanoidEnv,
        "ant": AntEnv,
        "hopper": HopperEnv,
        "halfcheetah": HalfCheetahEnv,
    }[name](dtype=jnp.float32)


def load_policy(path, env):
    from tds_tpu.learn.nn import linear_policy
    from tds_tpu.learn.running_stat import RunningStat
    from tds_tpu.utils.checkpoint import load_checkpoint

    saved, meta = load_checkpoint(path)
    obs_stat = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), saved["obs_stat"]
    )
    if not isinstance(obs_stat, RunningStat):
        obs_stat = RunningStat(*obs_stat)
    params = saved["params"]
    if isinstance(params, dict):  # PPO networks: deterministic mean action
        from tds_tpu.learn.ppo import PPONetworks

        h = int(saved.get("hidden", 64))
        nets = PPONetworks(env.observation_dim, env.action_dim, hidden=(h, h))
        pp = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), params)

        def act(obs):
            return nets.policy.apply(pp["policy"], obs_stat.normalize(obs))

    else:
        policy = linear_policy(env.observation_dim, env.action_dim)
        pp = jnp.asarray(params, jnp.float32)

        def act(obs):
            return policy.apply(pp, obs_stat.normalize(obs))

    return act, meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--env", default="humanoid")
    ap.add_argument("--length", type=int, default=3000)
    ap.add_argument("--seeds", default="0,7,123,42")
    args = ap.parse_args()

    env = make_env(args.env)
    act, meta = load_policy(args.checkpoint, env)

    @functools.partial(jax.jit, static_argnums=1)
    def rollout(key, length):
        st, obs = env.reset(key)

        def step(carry, _):
            st, obs, total, alive, steps, x = carry
            st, obs, reward, done = env.step(
                st, env.action_transform(act(obs))
            )
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

    print(f"# {args.checkpoint} (meta {meta}) env={args.env} "
          f"length={args.length}")
    rows = {}
    for seed in (int(s) for s in args.seeds.split(",")):
        total, steps, x = rollout(jax.random.PRNGKey(seed), args.length)
        rows[seed] = {"x": round(float(x), 2), "steps": int(float(steps)),
                      "reward": round(float(total), 1)}
        print(f"seed {seed}: x={float(x):+.2f} m steps={float(steps):.0f} "
              f"reward={float(total):.1f}", flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
