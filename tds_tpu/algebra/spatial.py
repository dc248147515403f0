"""Spatial (6D) vector algebra, Featherstone style, batch-friendly.

A spatial vector is a plain jnp array of shape (..., 6) laid out as
``[top(3), bottom(3)]``:
- motion vectors: top = angular velocity w, bottom = linear velocity v
- force vectors:  top = torque/moment n,   bottom = linear force f

Matches the reference's SpatialVector/MotionVector/ForceVector semantics
(src/math/spatial_vector.hpp:10-230) and the cross products in
src/math/tiny/tiny_algebra.hpp:101-115.
"""

import jax.numpy as jnp


def mv(top, bottom):
    """Build a spatial vector from top (angular) and bottom (linear) parts.

    The halves may carry different batch shapes (e.g. a static joint axis
    against a batched frame); they are broadcast to a common batch —
    trace-time only, XLA folds broadcasts into consumers.
    """
    if top.shape[:-1] != bottom.shape[:-1]:
        top, bottom = jnp.broadcast_arrays(top, bottom)
    return jnp.concatenate([top, bottom], axis=-1)


fv = mv  # force vectors share the container


def top(v):
    return v[..., :3]


def bottom(v):
    return v[..., 3:]


def zero(dtype=None, batch_shape=()):
    return jnp.zeros(batch_shape + (6,), dtype=dtype)


def cross_mm(a, b):
    """Motion x motion: crm(a) @ b = [w_a x w_b, w_a x v_b + v_a x w_b].

    Reference: tiny_algebra.hpp:101-105.
    """
    at, ab = a[..., :3], a[..., 3:]
    bt, bb = b[..., :3], b[..., 3:]
    return mv(jnp.cross(at, bt), jnp.cross(at, bb) + jnp.cross(ab, bt))


def cross_mf(a, f):
    """Motion x* force: crf(a) @ f = [w x n + v x f, w x f].

    Reference: tiny_algebra.hpp:112-115.
    """
    at, ab = a[..., :3], a[..., 3:]
    ft, fb = f[..., :3], f[..., 3:]
    return fv(jnp.cross(at, ft) + jnp.cross(ab, fb), jnp.cross(at, fb))


def dot(a, b):
    """Scalar pairing of a motion and a force vector (or vice versa)."""
    return jnp.sum(a * b, axis=-1)


def safe_norm(v, axis=-1):
    """|v| with a well-defined zero gradient at v = 0 (double-where trick);
    plain jnp.linalg.norm backprops NaN at exactly zero."""
    sq = jnp.sum(v * v, axis=axis)
    positive = sq > 0
    safe = jnp.where(positive, sq, 1.0)
    return jnp.where(positive, jnp.sqrt(safe), 0.0)


def safe_normalize(v, axis=-1, eps=1e-12):
    """v/|v| with zero output (and finite gradient) at v = 0."""
    n = safe_norm(v, axis=axis)
    return v / jnp.maximum(n, eps)[..., None], n


def cross_matrix(v):
    """Skew-symmetric 3x3 matrix vx such that vx @ u = v x u."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], axis=-1),
            jnp.stack([z, o, -x], axis=-1),
            jnp.stack([-y, x, o], axis=-1),
        ],
        axis=-2,
    )
