#!/usr/bin/env python
"""Per-robot batch-size sweep on the real chip (VERDICT r4 #7).

The batch=16384 throughput plateau in bench.py was only ever established
for the flat-ground laikago metric; this sweeps each envelope robot
across batch sizes with the same scan-fused rollout bench.py times, so
the envelope defaults are measured rather than inherited.

Run: PYTHONPATH=.:/root/.axon_site python tools/batch_sweep.py [robot ...]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tds_tpu_jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_env(name):
    if name == "laikago":
        from tds_tpu.envs.laikago import LaikagoEnv

        return LaikagoEnv(dtype=jnp.float32)
    if name == "ant":
        from tds_tpu.envs.ant import AntEnv

        return AntEnv(dtype=jnp.float32)
    if name == "humanoid":
        from tds_tpu.envs.humanoid import HumanoidEnv

        return HumanoidEnv(dtype=jnp.float32)
    if name == "terrain":
        import math

        from tds_tpu.envs.laikago import LaikagoEnv
        from tds_tpu.utils.terrain import make_heightfield

        terrain = make_heightfield(
            13, 7, (-1.0, 5.0), (-1.5, 1.5),
            lambda x, y: 0.02 * math.sin(math.pi * x) * math.cos(math.pi * y),
            max_contacts=3,
        )
        scan_pts = tuple(
            (x, y) for x in (0.15, 0.35, 0.55) for y in (-0.15, 0.0, 0.15)
        )
        return LaikagoEnv(dtype=jnp.float32, terrain=terrain, height_scan=scan_pts)
    raise SystemExit(f"unknown robot {name}")


def measure(env, batch, length):
    import numpy as np

    from tds_tpu.learn.nn import linear_policy

    pol = linear_policy(env.observation_dim, env.action_dim)
    pp = jnp.zeros((pol.num_parameters,), jnp.float32)

    def roll(states, obs):
        def body(carry, _):
            st, ob = carry
            a = jax.vmap(lambda o: pol.apply(pp, o))(ob)
            st, ob, _r, _d = jax.vmap(env.step)(st, a)
            return (st, ob), ()

        (states, obs), _ = jax.lax.scan(
            body, (states, obs), None, length=length, unroll=2
        )
        return states, obs

    ks = jax.random.split(jax.random.PRNGKey(2), batch)
    st0, ob0 = jax.jit(jax.vmap(env.reset))(ks)
    jax.block_until_ready(ob0)
    t0 = time.time()
    rc = jax.jit(roll).lower(st0, ob0).compile()
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _s, ob = rc(st0, ob0)
        np.asarray(ob[0, 0])
        best = min(best, time.time() - t0)
    return batch * length / best, compile_s


SWEEPS = {
    "laikago": (500, (4096, 8192, 16384, 32768)),
    "ant": (250, (2048, 4096, 8192, 16384, 32768)),
    "humanoid": (100, (1024, 2048, 4096, 8192, 16384)),
    "terrain": (250, (4096, 8192, 16384, 32768)),
}


def main():
    robots = sys.argv[1:] or list(SWEEPS)
    out = {}
    for robot in robots:
        length, batches = SWEEPS[robot]
        env = make_env(robot)
        rows = {}
        for b in batches:
            val, compile_s = measure(env, b, length)
            rows[b] = round(val, 1)
            print(f"# {robot} batch={b}: {val / 1e6:.3f}M steps/s "
                  f"(compile {compile_s:.1f}s)", file=sys.stderr, flush=True)
        best = max(rows, key=rows.get)
        out[robot] = {"best_batch": best, "steps_per_s": rows}
        print(json.dumps({robot: out[robot]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
