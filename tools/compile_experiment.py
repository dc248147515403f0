#!/usr/bin/env python
"""Cold-compile attribution experiment: jaxpr size vs compile-service warmup.

Round-2 left an open question (VERDICT weak #3): is the 120-930 s cold
compile of the laikago step caused by the 8.7K-equation jaxpr (fixable by
scan-over-legs / CSE) or by per-session compile-service warmup (not
builder-controllable)?

Protocol (run with a FRESH persistent-cache dir so nothing is served from
disk): compile a sequence of NOVEL graphs of increasing size in one
process and time each. If the first compile is slow regardless of size and
subsequent, much larger graphs compile fast, the cost is per-session
warmup; if compile time scales with equation count, the jaxpr is the
lever.

    PYTHONPATH=.:/root/.axon_site \
    JAX_COMPILATION_CACHE_DIR=$(mktemp -d) python tools/compile_experiment.py

Results land in PROGRESS.md; the graph set: pendulum2 step (~0.2K eqns),
ant contact step (~4K), laikago contact step (~8.7K), laikago at a second
batch size (recompile of same structure).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def timed_compile(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    n_eqns = str(lowered.as_text()).count("\n")  # HLO line count proxy
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    t0 = time.time()
    out = compiled(*args)
    jax.block_until_ready(out)
    t_first = time.time() - t0
    rec = {
        "graph": name,
        "hlo_lines": n_eqns,
        "lower_s": round(t_lower, 2),
        "compile_s": round(t_compile, 2),
        "first_exec_s": round(t_first, 2),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    print(f"# cache_dir={os.environ.get('JAX_COMPILATION_CACHE_DIR')} "
          f"device={jax.devices()[0]}", file=sys.stderr)
    from tds_tpu.envs.ant import AntEnv
    from tds_tpu.envs.laikago import LaikagoEnv
    from tds_tpu.dynamics import forward_dynamics, integrate_euler
    from tds_tpu.model.pendulum import compound_pendulum

    batch = 4096
    recs = []

    # 1. tiny novel graph first: if THIS is slow, warmup dominates
    pend = compound_pendulum(2)
    grav = jnp.asarray([0.0, 0.0, -9.81], jnp.float32)

    def pend_step(q, qd):
        qdd = forward_dynamics(pend, q, qd, jnp.zeros_like(q), grav)
        return integrate_euler(pend, q, qd, qdd, 1e-3)

    qp = jnp.zeros((batch, 2), jnp.float32)
    recs.append(timed_compile("pendulum2_step", jax.vmap(pend_step), qp, qp))

    # 2. mid-size: ant contact step
    ant = AntEnv(dtype=jnp.float32)
    qa0, qda0 = ant.initial_state(jax.random.PRNGKey(0))
    qa = jnp.tile(qa0[None], (batch, 1))
    qda = jnp.tile(qda0[None], (batch, 1))

    def ant_step(q, qd):
        return ant.sim_step(q, qd, jnp.zeros(ant.action_dim, q.dtype))

    recs.append(timed_compile("ant_contact_step", jax.vmap(ant_step), qa, qda))

    # 3. flagship: laikago contact step
    env = LaikagoEnv(dtype=jnp.float32)
    ql0, qdl0 = env.initial_state(jax.random.PRNGKey(0))
    ql = jnp.tile(ql0[None], (batch, 1))
    qdl = jnp.tile(qdl0[None], (batch, 1))

    def lk_step(q, qd):
        return env.sim_step(q, qd, jnp.zeros(env.action_dim, q.dtype))

    recs.append(timed_compile("laikago_contact_step", jax.vmap(lk_step), ql, qdl))

    # 4. same structure, new batch (new program, warm session)
    ql2 = jnp.tile(ql0[None], (batch * 2, 1))
    qdl2 = jnp.tile(qdl0[None], (batch * 2, 1))
    recs.append(
        timed_compile("laikago_contact_step_b8192", jax.vmap(lk_step), ql2, qdl2)
    )

    print(json.dumps({"summary": recs}))


if __name__ == "__main__":
    main()
