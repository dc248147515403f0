"""Pallas TPU kernel for the batched projected Gauss-Seidel sweep.

Proof-of-concept for the round-2 "fused step kernel" direction: the PGS
inner loop is sequential over constraint rows but embarrassingly parallel
over environments — the ideal Pallas shape (batch tiles on the lane
dimension, rows unrolled in-register). Semantically identical to
tds_tpu.contact.mlcp.solve_pgs (impulse-coupled Coulomb bounds).

Falls back to interpret mode off-TPU, so the correctness test runs in CI.
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
    # x kept as a Python list of (block, 1) columns: the Gauss-Seidel
    # update is pure dataflow (TPU Pallas has no scatter lowering)
    n = b_ref.shape[-1]
    b = b_ref[:, :]
    lo = lo_ref[:, :]
    hi = hi_ref[:, :]
    zero = jnp.zeros_like(b[:, 0:1])
    x_cols = [zero] * n
    for _ in range(iterations):
        for i in range(n):
            row = a_ref[:, i, :]  # (block, n)
            delta = zero
            for j in range(n):
                if j != i:
                    delta = delta + row[:, j : j + 1] * x_cols[j]
            xi = (b[:, i : i + 1] - delta) / row[:, i : i + 1]
            dep = limit_dependency[i]
            if dep >= 0:
                s = jnp.maximum(x_cols[dep], 0.0)
            else:
                s = jnp.ones_like(xi)
            xi = jnp.clip(xi, lo[:, i : i + 1] * s, hi[:, i : i + 1] * s)
            x_cols[i] = xi
    x_ref[:, :] = jnp.concatenate(x_cols, axis=-1)


def solve_pgs_pallas(
    a_mat,
    b,
    lo,
    hi,
    limit_dependency: Sequence[int],
    iterations: int,
    block_batch: int = 256,
    interpret: bool = None,
):
    """Batched PGS: a_mat (B, n, n), b/lo/hi (B, n) -> x (B, n).

    Batch is tiled across the Pallas grid; rows/iterations unroll inside
    the kernel. ``interpret=None`` auto-selects interpret mode off-TPU.
    """
    bsz, n = b.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block = min(block_batch, bsz)
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

    kernel = partial(
        _pgs_kernel,
        limit_dependency=tuple(limit_dependency),
        iterations=iterations,
    )
    kwargs = {}
    if _VMEM is not None:
        kwargs = dict(
            in_specs=[
                pl.BlockSpec((block, n, n), lambda i: (i, 0, 0), memory_space=_VMEM),
                pl.BlockSpec((block, n), lambda i: (i, 0), memory_space=_VMEM),
                pl.BlockSpec((block, n), lambda i: (i, 0), memory_space=_VMEM),
                pl.BlockSpec((block, n), lambda i: (i, 0), memory_space=_VMEM),
            ],
            out_specs=pl.BlockSpec(
                (block, n), lambda i: (i, 0), memory_space=_VMEM
            ),
        )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((padded, n), b.dtype),
        grid=(padded // block,),
        interpret=interpret,
        **kwargs,
    )(a_mat, b, lo, hi)
    return out[:bsz]
