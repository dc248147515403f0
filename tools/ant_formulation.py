#!/usr/bin/env python
"""Ant contact-formulation lever sweep on the real chip (VERDICT r4 #2).

The ant step was diagnosed "at the HBM roofline for its contact
formulation" (17 plane candidates -> 51 MLCP rows). This measures the
formulation levers, each against the full-system baseline:

  full      top_k=0   (the r4 formulation, 51 rows)
  top8      top_k=8   (24 rows; float-identical while <=8 penetrate)
  top6      top_k=6   (18 rows)
  top8+1fr  top_k=8, num_friction_dir=1 (16 rows; anisotropic friction —
            documented accuracy delta, the reference's own num_friction_dir
            knob, mb_constraint_solver.hpp:60-70)
  top8+bf16 top_k=8, bf16 Delassus contraction with f32 accumulation

For each: scan-rollout steps/s (bench.py's shape) + accuracy vs baseline
(trained-policy displacement over the 10 s gate horizon, 4 seeds — the
metric the regression gates actually care about).

Run: PYTHONPATH=.:/root/.axon_site python tools/ant_formulation.py [batch]
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tds_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tds_tpu.contact.mlcp import ContactSolverParams
from tds_tpu.envs.ant import AntEnv
from tds_tpu.learn.nn import linear_policy

VARIANTS = {
    "full": ContactSolverParams(top_k=0),
    "top8": ContactSolverParams(top_k=8),
    "top6": ContactSolverParams(top_k=6),
    "top8+1fr": ContactSolverParams(top_k=8, num_friction_dir=1),
    "top8+bf16": ContactSolverParams(top_k=8, delassus_dtype="bf16"),
}


def throughput(env, batch, length=250):
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
    roof = {}
    try:
        ca = rc.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        roof = {
            "flops_per_step": round(float(ca.get("flops", 0.0)) / (batch * length), 1),
            "bytes_per_step": round(
                float(ca.get("bytes accessed", 0.0)) / (batch * length), 1
            ),
        }
    except Exception:
        pass
    return batch * length / best, compile_s, roof


def policy_eval(env, n=1000):
    """Trained ant checkpoint displacement, 4 seeds (the gate metric)."""
    from tds_tpu.learn.running_stat import RunningStat
    from tds_tpu.utils.checkpoint import load_checkpoint

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "logs", "ant_ars", "policy.pkl")
    saved, _ = load_checkpoint(path)
    params = jnp.asarray(saved["params"], jnp.float32)
    obs_stat = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), saved["obs_stat"]
    )
    if not isinstance(obs_stat, RunningStat):
        obs_stat = RunningStat(*obs_stat)
    policy = linear_policy(env.observation_dim, env.action_dim)

    @functools.partial(jax.jit, static_argnums=1)
    def rollout(key, length):
        st, obs = env.reset(key)

        def step(carry, _):
            st, obs, alive, x = carry
            a = env.action_transform(policy.apply(params, obs_stat.normalize(obs)))
            st, obs, _r, d = env.step(st, a)
            x = jnp.where(alive > 0, st.q[0], x)
            alive = alive * (1.0 - d.astype(obs.dtype))
            return (st, obs, alive, x), None

        z = jnp.zeros((), jnp.float32)
        (st, obs, alive, x), _ = jax.lax.scan(
            step, (st, obs, jnp.ones((), jnp.float32), z), None, length=length
        )
        return x

    return [round(float(rollout(jax.random.PRNGKey(s), n)), 2)
            for s in (0, 7, 123, 42)]


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    names = sys.argv[2:] or list(VARIANTS)  # resumable per-variant
    out = {}
    for name, solver in ((n, VARIANTS[n]) for n in names):
        env = AntEnv(dtype=jnp.float32, solver=solver)
        sps, compile_s, roof = throughput(env, batch)
        xs = policy_eval(env)
        out[name] = {"steps_per_s": round(sps, 1), "policy_x_4seed": xs, **roof}
        print(f"# {name:9s}: {sps / 1e6:.3f}M steps/s (compile {compile_s:.0f}s) "
              f"policy_x={xs} {roof}", file=sys.stderr, flush=True)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
