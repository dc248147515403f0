"""algebra.smallmat must agree with the einsum/@ formulations it replaced.

These ops carry the whole physics hot path (see smallmat.py's module
docstring for the TPU rationale), so each one is pinned against the
reference contraction on random batched inputs, including gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tds_tpu.algebra import smallmat as sm


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float64)


KEYS = jax.random.split(jax.random.PRNGKey(0), 8)


@pytest.mark.parametrize("batch", [(), (5,), (2, 3)])
def test_mv_mtv(batch):
    m = _rand(KEYS[0], batch + (6, 3))
    v3 = _rand(KEYS[1], batch + (3,))
    v6 = _rand(KEYS[2], batch + (6,))
    np.testing.assert_allclose(
        sm.mv(m, v3), jnp.einsum("...ij,...j->...i", m, v3), rtol=1e-12
    )
    np.testing.assert_allclose(
        sm.mtv(m, v6), jnp.einsum("...ji,...j->...i", m, v6), rtol=1e-12
    )


@pytest.mark.parametrize("batch", [(), (4,)])
def test_mm_family(batch):
    a = _rand(KEYS[3], batch + (3, 6))
    b = _rand(KEYS[4], batch + (6, 4))
    c = _rand(KEYS[5], batch + (3, 4))
    np.testing.assert_allclose(sm.mm(a, b), a @ b, rtol=1e-12)
    np.testing.assert_allclose(
        sm.mtm(a, c), jnp.swapaxes(a, -1, -2) @ c, rtol=1e-12
    )
    d = _rand(KEYS[6], batch + (5, 6))
    np.testing.assert_allclose(
        sm.mmt(a, d), a @ jnp.swapaxes(d, -1, -2), rtol=1e-12
    )


def test_vmv_outer():
    a = _rand(KEYS[6], (7, 3))
    m = _rand(KEYS[7], (7, 3, 4))
    b = _rand(KEYS[0], (7, 4))
    np.testing.assert_allclose(
        sm.vmv(a, m, b), jnp.einsum("...i,...ij,...j->...", a, m, b), rtol=1e-12
    )
    np.testing.assert_allclose(
        sm.outer(a, b), jnp.einsum("...i,...j->...ij", a, b), rtol=1e-12
    )


def test_gradients_match():
    a = _rand(KEYS[1], (3, 3))
    v = _rand(KEYS[2], (3,))
    g1 = jax.grad(lambda m: jnp.sum(sm.mv(m, v) ** 2))(a)
    g2 = jax.grad(lambda m: jnp.sum((m @ v) ** 2))(a)
    np.testing.assert_allclose(g1, g2, rtol=1e-12)


def test_unrolled_branch_matches(monkeypatch):
    """The scalar-expanded branch (used when _UNROLL_LIMIT is raised) must
    agree with the broadcast+reduce default."""
    import tds_tpu.algebra.smallmat as smod

    a = _rand(KEYS[2], (4, 3, 3))
    b = _rand(KEYS[3], (4, 3, 3))
    v = _rand(KEYS[4], (4, 3))
    base = (sm.mm(a, b), sm.mv(a, v), sm.mtv(a, v), sm.mtm(a, b), sm.mmt(a, b))
    monkeypatch.setattr(smod, "_UNROLL_LIMIT", 64)
    unrolled = (sm.mm(a, b), sm.mv(a, v), sm.mtv(a, v), sm.mtm(a, b), sm.mmt(a, b))
    for x, y in zip(base, unrolled):
        np.testing.assert_allclose(x, y, rtol=1e-12)
