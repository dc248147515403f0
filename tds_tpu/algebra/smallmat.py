"""Small fixed-size matrix products, scalar-expanded for the TPU VPU.

TPU rationale, round 2 measurements (laikago contact step, batch 4096,
one v5e chip):

1. ``dot_general`` on tiny batched operands pads onto the MXU: ~850 such
   dots were 45% of the step at ~56 GB/s effective HBM bandwidth.
   Replacing them with broadcast-multiply + ``sum`` (VPU) took the step
   4.3ms -> 0.80ms (845K -> 5.0M env-steps/s).
2. The broadcast+reduce form still materializes (B, m, k, n) intermediates
   at fusion boundaries (reduce ops ended up ~263us/step at HBM roofline).
   Scalar-expanding the contraction — matrices as m*n lane vectors, the
   sum unrolled — keeps everything elementwise, so XLA fuses whole chains
   into single kernels and cancels the pack/unpack (stack -> slice) between
   consecutive ops: a 19-long 3x3 matmul chain measured 13.4us vs 37.3us
   for the broadcast+reduce form.

Contractions with many unrolled terms would bloat the HLO, so anything
above ``_UNROLL_LIMIT`` multiply terms falls back to broadcast+reduce
(still VPU, never the padded MXU). Only use these helpers for small,
static trailing dimensions; real matmuls (policy MLPs, renderer) should
keep ``@``/``einsum`` so the MXU is used.

Replaces the role of the reference's fixed-size matrix types
(src/math/tiny/tiny_matrix3x3.h, tiny_matrix6x6.hpp) — there the win was
avoiding malloc; here it is avoiding the systolic array and the fusion
boundaries.
"""

import os

import jax.numpy as jnp

# Max unrolled multiply terms before scalar expansion falls back to
# broadcast+reduce. Default 0 = always broadcast+reduce: scalar expansion
# wins at runtime (19-chain 3x3 matmul: 13.4us vs 37.3us) but the 3x3 ops
# dominate the physics step, and unrolling them grew the laikago step
# jaxpr ~10x (8.7K -> 90K eqns, CPU compile 9s -> 59s). Round-3 compile
# attribution (PROGRESS.md) showed warm-session compiles are cheap, so
# the trade is worth probing per stack: override with
# TDS_SMALLMAT_UNROLL=<max terms> (read at import).
_UNROLL_LIMIT = int(os.environ.get("TDS_SMALLMAT_UNROLL", "0"))


def mv(m, v):
    """(..., M, N) @ (..., N) -> (..., M)."""
    mm_, nn = m.shape[-2], m.shape[-1]
    if mm_ * nn > _UNROLL_LIMIT:
        return jnp.sum(m * v[..., None, :], axis=-1)
    cols = [v[..., j] for j in range(nn)]
    return jnp.stack(
        [sum(m[..., i, j] * cols[j] for j in range(nn)) for i in range(mm_)],
        axis=-1,
    )


def mtv(m, v):
    """m^T v: (..., N, M) transposed @ (..., N) -> (..., M)."""
    nn, mm_ = m.shape[-2], m.shape[-1]
    if mm_ * nn > _UNROLL_LIMIT:
        return jnp.sum(m * v[..., :, None], axis=-2)
    rows = [v[..., i] for i in range(nn)]
    return jnp.stack(
        [sum(m[..., i, j] * rows[i] for i in range(nn)) for j in range(mm_)],
        axis=-1,
    )


def mm(a, b):
    """(..., M, K) @ (..., K, N) -> (..., M, N)."""
    mm_, kk = a.shape[-2], a.shape[-1]
    nn = b.shape[-1]
    if mm_ * kk * nn > _UNROLL_LIMIT:
        return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)
    return jnp.stack(
        [
            jnp.stack(
                [
                    sum(a[..., i, l] * b[..., l, j] for l in range(kk))
                    for j in range(nn)
                ],
                axis=-1,
            )
            for i in range(mm_)
        ],
        axis=-2,
    )


def mtm(a, b):
    """a^T b: (..., K, M) x (..., K, N) -> (..., M, N)."""
    kk, mm_ = a.shape[-2], a.shape[-1]
    nn = b.shape[-1]
    if mm_ * kk * nn > _UNROLL_LIMIT:
        return jnp.sum(a[..., :, :, None] * b[..., :, None, :], axis=-3)
    return jnp.stack(
        [
            jnp.stack(
                [
                    sum(a[..., l, i] * b[..., l, j] for l in range(kk))
                    for j in range(nn)
                ],
                axis=-1,
            )
            for i in range(mm_)
        ],
        axis=-2,
    )


def mmt(a, b):
    """a b^T: (..., M, K) x (..., N, K) -> (..., M, N)."""
    mm_, kk = a.shape[-2], a.shape[-1]
    nn = b.shape[-2]
    if mm_ * kk * nn > _UNROLL_LIMIT:
        return jnp.sum(a[..., :, None, :] * b[..., None, :, :], axis=-1)
    return jnp.stack(
        [
            jnp.stack(
                [
                    sum(a[..., i, l] * b[..., j, l] for l in range(kk))
                    for j in range(nn)
                ],
                axis=-1,
            )
            for i in range(mm_)
        ],
        axis=-2,
    )


def vmv(a, m, b):
    """a^T M b -> (...,): bilinear form over small matrices."""
    return jnp.sum(a[..., :, None] * m * b[..., None, :], axis=(-2, -1))


def outer(a, b):
    """(..., M) x (..., N) -> (..., M, N)."""
    return a[..., :, None] * b[..., None, :]
