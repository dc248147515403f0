"""Small fixed-size matrix products as broadcast-multiply + reduce.

TPU rationale: the physics hot path is thousands of tiny batched products
(3x3, 6x6, 6x3 per link, batched over envs). Lowering them through
``dot_general`` sends each one to the MXU, where a (B, 3, 3) x (B, 3)
contraction pads to (8, 128) tiles — profiling the laikago step showed
~850 such dots costing ~2 us each (45% of the step) while moving ~16x
more HBM bytes than the underlying data. Phrasing the same contraction as
an elementwise broadcast multiply + ``sum`` keeps it on the VPU, where XLA
fuses it into the surrounding elementwise work instead of cutting a kernel
boundary.

Only use these for *small, fixed* trailing dimensions (<= ~32). For real
matmuls (policy MLPs, renderer) keep ``@``/``einsum`` so the MXU is used.

Replaces the role of the reference's fixed-size matrix types
(src/math/tiny/tiny_matrix3x3.h, tiny_matrix6x6.hpp) — there the win was
avoiding malloc; here it is avoiding the systolic array.
"""

import jax.numpy as jnp


def mv(m, v):
    """(..., M, N) @ (..., N) -> (..., M)."""
    return jnp.sum(m * v[..., None, :], axis=-1)


def mtv(m, v):
    """m^T v: (..., N, M) transposed @ (..., N) -> (..., M)."""
    return jnp.sum(m * v[..., :, None], axis=-2)


def mm(a, b):
    """(..., M, K) @ (..., K, N) -> (..., M, N)."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def mtm(a, b):
    """a^T b: (..., K, M) x (..., K, N) -> (..., M, N)."""
    return jnp.sum(a[..., :, :, None] * b[..., :, None, :], axis=-3)


def mmt(a, b):
    """a b^T: (..., M, K) x (..., N, K) -> (..., M, N)."""
    return jnp.sum(a[..., :, None, :] * b[..., None, :, :], axis=-1)


def vmv(a, m, b):
    """a^T M b -> (...,): bilinear form over small matrices."""
    return jnp.sum(a[..., :, None] * m * b[..., None, :], axis=(-2, -1))


def outer(a, b):
    """(..., M) x (..., N) -> (..., M, N)."""
    return a[..., :, None] * b[..., None, :]
