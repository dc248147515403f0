"""TPU-friendly small dense linear algebra.

``jnp.linalg.inv/cholesky/solve`` lower to sequential LU/while-loops with
dynamic slicing — catastrophic for small batched systems on TPU (the
mass-matrix solves in the contact pipeline are (B, n, n) with n ~ 10-30).
Since n is a static model property, we unroll Cholesky factorization and
triangular solves into pure elementwise/batched ops that XLA fuses across
the batch, and use closed-form inverses for 2x2/3x3 blocks.
"""

import jax.numpy as jnp


def inv3(m):
    """Closed-form inverse of (..., 3, 3) via the adjugate."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co_a = e * i - f * h
    co_b = f * g - d * i
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            jnp.stack([co_a, c * h - b * i, b * f - c * e], axis=-1),
            jnp.stack([co_b, a * i - c * g, c * d - a * f], axis=-1),
            jnp.stack([co_c, b * g - a * h, a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def cholesky_unrolled(a):
    """Lower Cholesky factor of SPD (..., n, n); loops unrolled over the
    static n so the lowering is pure fused arithmetic over the batch."""
    n = a.shape[-1]
    # l[i][j] scalars with arbitrary batch shape
    l = [[None] * n for _ in range(n)]
    for j in range(n):
        s = a[..., j, j]
        for k in range(j):
            s = s - l[j][k] * l[j][k]
        l[j][j] = jnp.sqrt(s)
        inv_ljj = 1.0 / l[j][j]
        for i in range(j + 1, n):
            s = a[..., i, j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            l[i][j] = s * inv_ljj
    zero = jnp.zeros_like(a[..., 0, 0])
    rows = [
        jnp.stack([l[i][j] if j <= i else zero for j in range(n)], axis=-1)
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def cho_solve_unrolled(l, b):
    """Solve A x = b given the lower Cholesky factor of A.

    ``b`` may be (..., n) or (..., n, k); loops unrolled over static n.
    """
    n = l.shape[-1]
    vec = b.ndim == l.ndim - 1
    if vec:
        b = b[..., None]
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i, :]
        for k in range(i):
            s = s - l[..., i, k, None] * y[k]
        y[i] = s / l[..., i, i, None]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - l[..., k, i, None] * x[k]
        x[i] = s / l[..., i, i, None]
    out = jnp.stack(x, axis=-2)
    return out[..., 0] if vec else out


def solve_pd(a, b):
    """Solve SPD system via unrolled Cholesky."""
    return cho_solve_unrolled(cholesky_unrolled(a), b)


def inv_pd(a):
    """Inverse of SPD (..., n, n) via unrolled Cholesky solves."""
    n = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    return cho_solve_unrolled(cholesky_unrolled(a), eye)
