"""Batched raycasting against analytic shapes.

Analog of src/math/tiny/tiny_raycast.h:12-269 (ray vs sphere/box/plane over
a multibody's collision objects, batch ``cast_rays``), vectorized: rays are
(…, 3) origin/direction arrays and every hit test is branchless, so the
whole query jits and vmaps (e.g. for LIDAR-style observations).
"""

from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp

from tds_tpu.algebra.transform import Transform
from tds_tpu.model.geometry import Box, Mesh, Plane, Sphere

BIG = 1e30


class RayHit(NamedTuple):
    fraction: jnp.ndarray  # (…,) hit fraction along the ray in [0,1], BIG if miss
    normal: jnp.ndarray  # (…, 3) world hit normal
    geom_index: jnp.ndarray  # (…,) index of the closest geom (-1 if none)

    @property
    def hit(self):
        return self.fraction <= 1.0


def ray_sphere(origin, target, center, radius):
    """Fraction along origin->target of the first sphere intersection
    (tiny_raycast.h ray-sphere), BIG on miss."""
    d = target - origin
    oc = origin - center
    a = jnp.sum(d * d, axis=-1)
    b = 2.0 * jnp.sum(oc * d, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = b * b - 4 * a * c
    safe = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - safe) / (2 * jnp.maximum(a, 1e-30))
    t1 = (-b + safe) / (2 * jnp.maximum(a, 1e-30))
    t = jnp.where(t0 >= 0.0, t0, t1)
    miss = (disc < 0.0) | (t < 0.0)
    return jnp.where(miss, BIG, t)


def ray_plane(origin, target, normal, constant):
    d = target - origin
    n = jnp.asarray(normal)
    denom = jnp.sum(d * n, axis=-1)
    t = (constant - jnp.sum(origin * n, axis=-1)) / jnp.where(
        jnp.abs(denom) > 1e-12, denom, 1e-12
    )
    miss = (jnp.abs(denom) <= 1e-12) | (t < 0.0)
    return jnp.where(miss, BIG, t)


def ray_box(origin, target, x: Transform, half_extents):
    """Slab test in the box frame, branchless."""
    o = x.apply_inverse_point(origin)
    e = x.apply_inverse_point(target)
    d = e - o
    he = jnp.asarray(half_extents)
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d, 1e-12)
    t1 = (-he - o) * inv
    t2 = (he - o) * inv
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin >= 0.0)
    return jnp.where(hit, tmin, BIG)


def ray_mesh(origin, target, mesh: Mesh, x: Transform):
    """Branchless Moller-Trumbore over the mesh's triangle set (beyond
    reference: tiny_raycast.h has sphere/box/plane only). Returns
    (fraction, world normal of the hit triangle oriented against the ray);
    fraction BIG on miss. Triangles are trace-time constants."""
    from tds_tpu.collision.narrowphase import _mesh_data, _world_vertices

    verts, tris = _mesh_data(mesh.file_name, mesh.scale)
    w = _world_vertices(mesh, x)  # (…, V, 3)
    a = jnp.take(w, jnp.asarray(tris[:, 0]), axis=-2)
    b = jnp.take(w, jnp.asarray(tris[:, 1]), axis=-2)
    c = jnp.take(w, jnp.asarray(tris[:, 2]), axis=-2)
    d = (target - origin)[..., None, :]  # (…, 1, 3)
    o = origin[..., None, :]
    e1 = b - a
    e2 = c - a
    h = jnp.cross(d, e2)
    det = jnp.sum(e1 * h, axis=-1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    s = o - a
    u = jnp.sum(s * h, axis=-1) * inv_det
    q = jnp.cross(s, e1)
    v = jnp.sum(d * q, axis=-1) * inv_det
    t = jnp.sum(e2 * q, axis=-1) * inv_det
    valid = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= 0.0)
    )
    t = jnp.where(valid, t, BIG)  # (…, T)
    imin = jnp.argmin(t, axis=-1)
    tmin = jnp.take_along_axis(t, imin[..., None], axis=-1)[..., 0]
    n_tri = jnp.cross(e1, e2)
    n_tri = n_tri / jnp.maximum(
        jnp.linalg.norm(n_tri, axis=-1, keepdims=True), 1e-12
    )
    n_hit = jnp.take_along_axis(
        jnp.broadcast_to(n_tri, t.shape + (3,)), imin[..., None, None],
        axis=-2,
    )[..., 0, :]
    # orient against the ray direction
    flip_n = jnp.sign(jnp.sum(n_hit * d[..., 0, :], axis=-1))
    n_hit = -n_hit * jnp.where(flip_n == 0, 1.0, flip_n)[..., None]
    return tmin, n_hit


def cast_rays(
    origins,
    targets,
    shapes: Sequence,
    transforms: Sequence[Transform],
) -> RayHit:
    """Closest hit over a static list of (shape, world transform) pairs.

    origins/targets broadcast over leading batch dims.
    """
    origins = jnp.asarray(origins)
    targets = jnp.asarray(targets)
    best_t = jnp.full(origins.shape[:-1], BIG, origins.dtype)
    best_n = jnp.zeros_like(origins)
    best_i = jnp.full(origins.shape[:-1], -1, jnp.int32)
    d = targets - origins
    for idx, (shape, x) in enumerate(zip(shapes, transforms)):
        if isinstance(shape, Sphere):
            t = ray_sphere(origins, targets, x.pos, shape.radius)
            p = origins + t[..., None] * d
            n = p - x.pos
            n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        elif isinstance(shape, Plane):
            t = ray_plane(origins, targets, shape.normal, shape.constant)
            n = jnp.broadcast_to(jnp.asarray(shape.normal, origins.dtype), origins.shape)
        elif isinstance(shape, Box):
            he = [0.5 * e for e in shape.extents]
            t = ray_box(origins, targets, x, he)
            p_local = x.apply_inverse_point(origins + t[..., None] * d)
            # face normal = dominant axis of the local hit point
            scaled = p_local / jnp.asarray(he, origins.dtype)
            axis = jnp.argmax(jnp.abs(scaled), axis=-1)
            n_local = jnp.sign(scaled) * (
                jnp.arange(3) == axis[..., None]
            ).astype(origins.dtype)
            n = jnp.einsum("...ij,...j->...i", x.rot, n_local)
        elif isinstance(shape, Mesh):
            t, n = ray_mesh(origins, targets, shape, x)
        else:
            continue
        closer = t < best_t
        best_t = jnp.where(closer, t, best_t)
        best_n = jnp.where(closer[..., None], n, best_n)
        best_i = jnp.where(closer, idx, best_i)
    return RayHit(fraction=best_t, normal=best_n, geom_index=best_i)
