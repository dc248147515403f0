#!/usr/bin/env python
"""EXPERIMENT: the whole laikago contact step as ONE Pallas kernel.

Hypothesis: the XLA step at batch 16384 runs past the naive HBM roofline
(202% of logical bytes, bench.py) because fusion keeps ~half the logical
traffic on-chip, but the remaining fusion-boundary intermediates still
round-trip HBM. A mega-kernel that loads (block, dof) state tiles into
VMEM, traces the ENTIRE step body (PD -> FK -> ABA -> narrowphase ->
MLCP/PGS -> integrate) inside the kernel, and stores only the new state
would make the step compute-bound.

Risks (why this is an experiment, not a feature): Mosaic must compile a
~16K-op graph in one kernel; every (block, 3)/(block, 4) intermediate has
batch on sublanes and tiny feature dims on lanes (the transpose of the
lane-major layout pallas_pgs.py needed), so VPU lane utilization may be
poor; unsupported ops abort compilation.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/pallas_megastep_experiment.py
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tds_tpu_jax_cache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])


def main():
    batch = int(os.environ.get("TDS_BENCH_BATCH", 16384))
    block = int(os.environ.get("TDS_MEGA_BLOCK", 1024))
    inner_steps = int(os.environ.get("TDS_BENCH_STEPS", 100))
    interpret = bool(int(os.environ.get("TDS_MEGA_INTERPRET", "0")))

    env_name = os.environ.get("TDS_MEGA_ENV", "laikago")
    if env_name == "cartpole":
        from tds_tpu.envs.cartpole import CartpoleEnv

        env = CartpoleEnv(dtype=jnp.float32)
    elif env_name == "ant":
        from tds_tpu.envs.ant import AntEnv

        env = AntEnv(dtype=jnp.float32)
    else:
        from tds_tpu.envs.laikago import LaikagoEnv

        env = LaikagoEnv(dtype=jnp.float32)
    dof_q, dof_qd = env.model.dof_q, env.model.dof_qd

    def step_body(q, qd):
        action = jnp.zeros(q.shape[:-1] + (env.action_dim,), q.dtype)
        return env.sim_step(q, qd, action)

    # Model constants (inertias, joint transforms, solver tables) are
    # closed-over jnp arrays; Pallas kernels cannot capture device values,
    # so closure-convert them into explicit operands.
    ex_q = jnp.zeros((block, dof_q), jnp.float32)
    ex_qd = jnp.zeros((block, dof_qd), jnp.float32)
    closed_jaxpr = jax.make_jaxpr(step_body)(ex_q, ex_qd)
    consts = [jnp.asarray(c) for c in closed_jaxpr.consts]

    def converted(q, qd, *cs):
        out = jax.core.eval_jaxpr(closed_jaxpr.jaxpr, list(cs), q, qd)
        return out[0], out[1]

    const_shapes = [c.shape for c in consts]
    # Mosaic wants >=2D VMEM refs; ship each constant as (1, size) lanes.
    consts2d = [jnp.reshape(c, (1, max(1, c.size))) for c in consts]

    def kernel(q_ref, qd_ref, *refs):
        const_refs = refs[: len(consts2d)]
        qo_ref, qdo_ref = refs[len(consts2d) :]
        q = q_ref[...]
        qd = qd_ref[...]
        cs = [
            jnp.reshape(r[...], shp)
            for r, shp in zip(const_refs, const_shapes)
        ]
        q2, qd2 = converted(q, qd, *cs)  # whole-batch trace in VMEM
        qo_ref[...] = q2
        qdo_ref[...] = qd2

    grid = (batch // block,)
    mega_step_raw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, dof_q), lambda i: (i, 0)),
            pl.BlockSpec((block, dof_qd), lambda i: (i, 0)),
        ]
        + [
            pl.BlockSpec(c.shape, lambda i: (0, 0))
            for c in consts2d
        ],
        out_specs=[
            pl.BlockSpec((block, dof_q), lambda i: (i, 0)),
            pl.BlockSpec((block, dof_qd), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, dof_q), jnp.float32),
            jax.ShapeDtypeStruct((batch, dof_qd), jnp.float32),
        ],
        interpret=interpret,
    )

    @jax.jit
    def mega_step(q, qd):
        return mega_step_raw(q, qd, *consts2d)

    @jax.jit
    def xla_step(q, qd):
        action = jnp.zeros(q.shape[:-1] + (env.action_dim,), q.dtype)
        return env.sim_step(q, qd, action)

    key = jax.random.PRNGKey(0)
    if hasattr(env, "initial_state"):
        q0, qd0 = env.initial_state(key)
    else:
        q0 = jnp.zeros((dof_q,), jnp.float32)
        qd0 = jnp.zeros((dof_qd,), jnp.float32)
    qs = jnp.tile(q0[None, :], (batch, 1))
    qds = jnp.tile(qd0[None, :], (batch, 1))

    # correctness + compile
    t0 = time.time()
    try:
        mq, mqd = mega_step(qs, qds)
        jax.block_until_ready(mq)
    except Exception as e:
        print(f"MEGA-KERNEL FAILED to compile/run: {type(e).__name__}")
        print(str(e)[:2000])
        sys.exit(1)
    mega_compile = time.time() - t0
    t0 = time.time()
    xq, xqd = xla_step(qs, qds)
    jax.block_until_ready(xq)
    xla_compile = time.time() - t0

    err_q = float(jnp.max(jnp.abs(mq - xq)))
    err_qd = float(jnp.max(jnp.abs(mqd - xqd)))
    print(f"compile: mega={mega_compile:.1f}s xla={xla_compile:.1f}s")
    print(f"max|dq|={err_q:.3e} max|dqd|={err_qd:.3e}")

    def timeit(fn):
        best = float("inf")
        for _ in range(3):
            oq, oqd = qs, qds
            t0 = time.time()
            for _ in range(inner_steps):
                oq, oqd = fn(oq, oqd)
            jax.block_until_ready(oq)
            best = min(best, time.time() - t0)
        return batch * inner_steps / best

    mega_sps = timeit(mega_step)
    xla_sps = timeit(xla_step)
    print(
        f"batch={batch} block={block}: mega={mega_sps/1e6:.2f}M steps/s, "
        f"xla={xla_sps/1e6:.2f}M steps/s, ratio={mega_sps/xla_sps:.2f}x"
    )


if __name__ == "__main__":
    main()
