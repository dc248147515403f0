#!/usr/bin/env python
"""Harvest a brink-state reset pool from a trained policy's own rollouts.

Rolls the checkpoint on the (reference-reward) env, records (q, qd) every
--stride steps while alive within [--t_min, --t_max], across --seeds
seeds, and saves an .npz for LocomotionEnv(reset_pool=...). Pair with
examples/laikago_ars_train.py --reset_pool to focus training exactly
where the gait currently dies (see PROGRESS.md round 5: the humanoid
holds z~1.2 for 1200 steps then folds into a sit over ~300).

Run: PYTHONPATH=.:/root/.axon_site python tools/make_reset_pool.py \
        logs/humanoid_ars/policy_r5.pkl --env humanoid \
        --t_min 600 --t_max 1600 --out logs/humanoid_ars/pool_r5.npz
"""

import argparse
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tds_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from tools.policy_eval import load_policy, make_env

    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--env", default="humanoid")
    ap.add_argument("--t_min", type=int, default=600)
    ap.add_argument("--t_max", type=int, default=1600)
    ap.add_argument("--stride", type=int, default=10)
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    env = make_env(args.env)
    act, _meta = load_policy(args.checkpoint, env)

    @jax.jit
    def rollout(key):
        st, obs = env.reset(key)

        def step(carry, _):
            st, obs, alive = carry
            st, obs, _r, d = env.step(st, env.action_transform(act(obs)))
            alive = alive * (1.0 - d.astype(obs.dtype))
            return (st, obs, alive), (st.q, st.qd, alive)

        (_s, _o, _a), (qs, qds, alives) = jax.lax.scan(
            step, (st, obs, jnp.ones((), jnp.float32)), None,
            length=args.t_max,
        )
        return qs, qds, alives

    pool_q, pool_qd = [], []
    for seed in range(args.seeds):
        qs, qds, alives = rollout(jax.random.PRNGKey(seed))
        qs, qds, alives = np.asarray(qs), np.asarray(qds), np.asarray(alives)
        for t in range(args.t_min, args.t_max, args.stride):
            if alives[t] > 0:
                pool_q.append(qs[t])
                pool_qd.append(qds[t])
        print(f"seed {seed}: alive to {int(alives.sum())}, "
              f"pool size {len(pool_q)}", flush=True)
    np.savez(args.out, q=np.stack(pool_q), qd=np.stack(pool_qd))
    print(f"saved {len(pool_q)} states -> {args.out}")


if __name__ == "__main__":
    main()
