"""Pallas TPU kernel for the batched projected Gauss-Seidel sweep.

The PGS inner loop is sequential over constraint rows but embarrassingly
parallel over environments. The TPU-native layout puts the BATCH on the
lane dimension (128-wide vector registers) and the constraint rows on
sublanes: every quantity the kernel touches is a (1, block) lane vector,
every index is a static sublane slice, and the Gauss-Seidel recurrence is
pure dataflow — no scatter, no dynamic indexing, no 3D refs. (The round-1
version tiled batch on sublanes / rows on lanes with a 3D A-ref; Mosaic
hung compiling it. This 2D transposed form is the shape the compiler is
built for.)

Semantically identical to tds_tpu.contact.mlcp.solve_pgs (impulse-coupled
Coulomb bounds, mb_constraint_solver.hpp:122-135). The wrapper takes the
same (B, n, n)/(B, n) operands as the XLA path and transposes at the
boundary; XLA fuses those transposes into the producers.

Falls back to interpret mode off-TPU, so the correctness test runs in CI.

STATUS on the axon-tunnel TPU backend:
- round 1 (2026-08-17 early): batch-on-sublanes 3D-A-ref layout hung
  Mosaic compile >9 min, twice. Rewritten lane-major.
- round 2: lane-major compiled in 0.6s but device-to-host readback of the
  kernel output hung (plugin execution broken, reproduced twice).
- round 3 (2026-08-17 late): the plugin's Pallas execution now WORKS —
  readback completes, output matches the XLA solve_pgs to 6e-8 (f32), and
  the full laikago contact step with this kernel wired in runs at 1.02x
  the XLA-path throughput (4.55M vs 4.46M steps/s, batch 4096, same
  session). Wired behind ContactSolverParams(pgs_impl="pallas"); the XLA
  path stays the default since it fuses into the surrounding step and the
  kernel is at parity, not ahead. Requires whole-batch stepping (leading
  batch axis), not vmap-per-env.
"""

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU for interpret mode
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _pgs_kernel(a_ref, b_ref, lo_ref, hi_ref, x_ref, *, limit_dependency,
                iterations):
    # a_ref: (n*n, block) row-major A, b/lo/hi/x: (n, block).
    # x is a Python list of (1, block) lane vectors; the sequential
    # Gauss-Seidel dependency becomes register dataflow.
    n = b_ref.shape[0]
    zero = jnp.zeros_like(b_ref[0:1, :])
    x_rows = [zero] * n
    for _ in range(iterations):
        for i in range(n):
            delta = zero
            for j in range(n):
                if j != i:
                    delta = delta + a_ref[i * n + j : i * n + j + 1, :] * x_rows[j]
            xi = (b_ref[i : i + 1, :] - delta) / a_ref[i * n + i : i * n + i + 1, :]
            dep = limit_dependency[i]
            if dep >= 0:
                s = jnp.maximum(x_rows[dep], 0.0)
            else:
                s = jnp.ones_like(xi)
            xi = jnp.clip(xi, lo_ref[i : i + 1, :] * s, hi_ref[i : i + 1, :] * s)
            x_rows[i] = xi
    for i in range(n):
        x_ref[i : i + 1, :] = x_rows[i]


def solve_pgs_pallas(
    a_mat,
    b,
    lo,
    hi,
    limit_dependency: Sequence[int],
    iterations: int,
    block_batch: int = 512,
    interpret: bool = None,
):
    """Batched PGS: a_mat (B, n, n), b/lo/hi (B, n) -> x (B, n).

    Batch is tiled across the Pallas grid on the lane dimension;
    rows/iterations unroll inside the kernel. ``interpret=None``
    auto-selects interpret mode off-TPU.
    """
    bsz, n = b.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # Lane-dimension tiles must be a multiple of 128 for Mosaic; round the
    # block up and pad the batch to match (identity rows are inert in PGS).
    block = min(block_batch, bsz)
    block = max(128, -(-block // 128) * 128)
    if bsz % block != 0:
        # pad the batch to a block multiple
        pad = block - bsz % block
        a_mat = jnp.concatenate(
            [a_mat, jnp.tile(jnp.eye(n, dtype=a_mat.dtype)[None], (pad, 1, 1))]
        )
        b = jnp.concatenate([b, jnp.zeros((pad, n), b.dtype)])
        lo = jnp.concatenate([lo, jnp.zeros((pad, n), lo.dtype)])
        hi = jnp.concatenate([hi, jnp.zeros((pad, n), hi.dtype)])
    padded = b.shape[0]

    # boundary transposes into the lane-major layout
    a_t = a_mat.reshape(padded, n * n).T  # (n*n, B)
    b_t, lo_t, hi_t = b.T, lo.T, hi.T

    kernel = partial(
        _pgs_kernel,
        limit_dependency=tuple(limit_dependency),
        iterations=iterations,
    )
    kwargs = {}
    if _VMEM is not None:
        kwargs = dict(
            in_specs=[
                pl.BlockSpec((n * n, block), lambda i: (0, i), memory_space=_VMEM),
                pl.BlockSpec((n, block), lambda i: (0, i), memory_space=_VMEM),
                pl.BlockSpec((n, block), lambda i: (0, i), memory_space=_VMEM),
                pl.BlockSpec((n, block), lambda i: (0, i), memory_space=_VMEM),
            ],
            out_specs=pl.BlockSpec(
                (n, block), lambda i: (0, i), memory_space=_VMEM
            ),
        )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, padded), b.dtype),
        grid=(padded // block,),
        interpret=interpret,
        **kwargs,
    )(a_t, b_t, lo_t, hi_t)
    return out.T[:bsz]
