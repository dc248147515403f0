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


def symbolic_cholesky_fill(mask):
    """Lower-triangular nonzero pattern of chol(A) for a boolean coupling
    mask (computed in Python at trace time): nz(i,j) iff A(i,j) != 0 or
    exists k < j with nz(i,k) and nz(j,k)."""
    import numpy as np

    mask = np.asarray(mask, bool)
    n = mask.shape[0]
    nz = np.tril(mask | np.eye(n, dtype=bool))
    for j in range(n):
        for i in range(j + 1, n):
            if not nz[i, j]:
                for k in range(j):
                    if nz[i, k] and nz[j, k]:
                        nz[i, j] = True
                        break
    return nz


def cholesky_unrolled(a, pattern=None):
    """Lower Cholesky factor of SPD (..., n, n); loops unrolled over the
    static n so the lowering is pure fused arithmetic over the batch.

    ``pattern``: optional boolean lower-tri nonzero structure (from
    :func:`symbolic_cholesky_fill`); structurally-zero entries and their
    products are skipped at trace time (tree-topology mass matrices drop
    ~half the work)."""
    n = a.shape[-1]
    # l[i][j] scalars with arbitrary batch shape
    l = [[None] * n for _ in range(n)]

    def nz(i, j):
        return pattern is None or bool(pattern[i, j])

    for j in range(n):
        s = a[..., j, j]
        for k in range(j):
            if nz(j, k):
                s = s - l[j][k] * l[j][k]
        l[j][j] = jnp.sqrt(s)
        inv_ljj = 1.0 / l[j][j]
        for i in range(j + 1, n):
            if not nz(i, j):
                continue
            s = a[..., i, j]
            for k in range(j):
                if nz(i, k) and nz(j, k):
                    s = s - l[i][k] * l[j][k]
            l[i][j] = s * inv_ljj
    zero = jnp.zeros_like(a[..., 0, 0])
    rows = [
        jnp.stack(
            [
                l[i][j] if (j <= i and l[i][j] is not None) else zero
                for j in range(n)
            ],
            axis=-1,
        )
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def cho_solve_unrolled(l, b, pattern=None):
    """Solve A x = b given the lower Cholesky factor of A.

    ``b`` may be (..., n) or (..., n, k); loops unrolled over static n.
    ``pattern`` skips structurally-zero L entries (must match the factor's).
    """
    n = l.shape[-1]
    vec = b.ndim == l.ndim - 1
    if vec:
        b = b[..., None]

    def nz(i, j):
        return pattern is None or bool(pattern[i, j])

    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i, :]
        for k in range(i):
            if nz(i, k):
                s = s - l[..., i, k, None] * y[k]
        y[i] = s / l[..., i, i, None]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            if nz(k, i):
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
