"""Analytic narrowphase with static contact counts.

Every pair function always emits its fixed number of candidate contact
points (1 for sphere pairs, 2 for plane-capsule, 8 for plane-box, …); the
``distance`` field decides activity downstream via masking. This mirrors
the reference's CppAD tracing branch (contact_point.hpp:65-77) which is the
XLA-compatible formulation by construction; counts cited from
contact_point.hpp:44-438.

Contacts are batches of ``Contact`` pytrees with leaves shaped (…, k, 3)/(…, k).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tds_tpu.algebra.transform import Transform
from tds_tpu.algebra import smallmat as sm
from tds_tpu.model.geometry import Box, Capsule, Mesh, Plane, Sphere


class Contact(NamedTuple):
    """Candidate contact points (k per pair, stacked on axis -2)."""

    normal_on_b: jnp.ndarray  # (…, k, 3) world normal on body b
    point_a: jnp.ndarray  # (…, k, 3) world point on a
    point_b: jnp.ndarray  # (…, k, 3) world point on b
    distance: jnp.ndarray  # (…, k) signed distance (negative = penetrating)

    @property
    def count(self):
        return self.normal_on_b.shape[-2]

    @staticmethod
    def concatenate(contacts):
        return Contact(
            normal_on_b=jnp.concatenate([c.normal_on_b for c in contacts], axis=-2),
            point_a=jnp.concatenate([c.point_a for c in contacts], axis=-2),
            point_b=jnp.concatenate([c.point_b for c in contacts], axis=-2),
            distance=jnp.concatenate([c.distance for c in contacts], axis=-1),
        )


def sphere_sphere(sa: Sphere, xa: Transform, sb: Sphere, xb: Transform) -> Contact:
    """contact_point.hpp:44-94 (CppAD branch: always emit)."""
    from tds_tpu.algebra.spatial import safe_norm

    diff = xa.pos - xb.pos
    length = safe_norm(diff, axis=-1)
    safe = jnp.maximum(length, 1e-12)
    normal = diff / safe[..., None]
    distance = length - (sa.radius + sb.radius)
    point_a = xa.pos - sa.radius * normal
    point_b = point_a - distance[..., None] * normal
    return Contact(
        normal_on_b=normal[..., None, :],
        point_a=point_a[..., None, :],
        point_b=point_b[..., None, :],
        distance=distance[..., None],
    )


def plane_sphere(pa: Plane, xa: Transform, sb: Sphere, xb: Transform) -> Contact:
    """contact_point.hpp:97-125. Note world_normal_on_b = -plane_normal."""
    n = jnp.asarray(pa.normal, dtype=xb.pos.dtype)
    t = jnp.sum(xb.pos * n, axis=-1) - pa.constant
    point_a = xb.pos - t[..., None] * n
    distance = t - sb.radius
    point_b = xb.pos - sb.radius * n
    normal = jnp.broadcast_to(-n, point_b.shape)
    return Contact(
        normal_on_b=normal[..., None, :],
        point_a=point_a[..., None, :],
        point_b=point_b[..., None, :],
        distance=distance[..., None],
    )


def plane_capsule(pa: Plane, xa: Transform, cb: Capsule, xb: Transform) -> Contact:
    """Two sphere probes at the capsule axis endpoints
    (contact_point.hpp:128-161; capsule axis is local Z)."""
    half = 0.5 * cb.length
    sphere = Sphere(cb.radius)
    pts = []
    for sz in (half, -half):
        local = jnp.asarray([0.0, 0.0, sz], dtype=xb.pos.dtype)
        center = xb.apply_point(local)
        pts.append(plane_sphere(pa, xa, sphere, Transform(pos=center, rot=xb.rot)))
    return Contact.concatenate(pts)


def plane_box(pa: Plane, xa: Transform, bb: Box, xb: Transform) -> Contact:
    """Eight corner-sphere probes with minimum radius 1e-2 shrunk corners
    (contact_point.hpp:164-198, box corner points geometry.hpp:244)."""
    r = max(1e-2, getattr(bb, "radius", 0.0) or 1e-2)
    sphere = Sphere(r)
    he = [0.5 * e - r for e in bb.extents]
    pts = []
    for sx in (1.0, -1.0):
        for sy in (1.0, -1.0):
            for sz in (1.0, -1.0):
                local = jnp.asarray(
                    [sx * he[0], sy * he[1], sz * he[2]], dtype=xb.pos.dtype
                )
                center = xb.apply_point(local)
                pts.append(
                    plane_sphere(pa, xa, sphere, Transform(pos=center, rot=xb.rot))
                )
    return Contact.concatenate(pts)


def sphere_box(sa: Sphere, xa: Transform, bb: Box, xb: Transform) -> Contact:
    """Branchless sphere-box (contact_point.hpp:220-404): clamp the sphere
    center to the box, with the interior (penetrating-center) case handled
    by face-projection via jnp.where."""
    dtype = xa.pos.dtype
    he = jnp.asarray([0.5 * e for e in bb.extents], dtype=dtype)
    rel = xb.apply_inverse_point(xa.pos)
    closest = jnp.clip(rel, -he, he)
    delta = rel - closest
    from tds_tpu.algebra.spatial import safe_norm

    dist_out = safe_norm(delta, axis=-1)
    outside = dist_out > 1e-12
    n_out = delta / jnp.maximum(dist_out, 1e-12)[..., None]

    # interior: distance to each face, pick the closest
    face_d = jnp.stack(
        [
            he[0] - rel[..., 0],
            he[0] + rel[..., 0],
            he[1] - rel[..., 1],
            he[1] + rel[..., 1],
            he[2] - rel[..., 2],
            he[2] + rel[..., 2],
        ],
        axis=-1,
    )
    face_idx = jnp.argmin(face_d, axis=-1)
    face_normals = jnp.asarray(
        [
            [1.0, 0, 0],
            [-1.0, 0, 0],
            [0, 1.0, 0],
            [0, -1.0, 0],
            [0, 0, 1.0],
            [0, 0, -1.0],
        ],
        dtype=dtype,
    )
    n_in = face_normals[face_idx]
    d_in = -jnp.take_along_axis(face_d, face_idx[..., None], axis=-1)[..., 0]
    closest_in = rel - d_in[..., None] * n_in

    n_local = jnp.where(outside[..., None], n_out, n_in)
    dist_center = jnp.where(outside, dist_out, d_in)
    closest_local = jnp.where(outside[..., None], closest, closest_in)

    normal_world = sm.mv(xb.rot, n_local)
    point_b = xb.apply_point(closest_local)
    distance = dist_center - sa.radius
    point_a = xa.pos - sa.radius * normal_world
    return Contact(
        normal_on_b=normal_world[..., None, :],
        point_a=point_a[..., None, :],
        point_b=point_b[..., None, :],
        distance=distance[..., None],
    )


def capsule_sphere(ca: Capsule, xa: Transform, sb: Sphere, xb: Transform) -> Contact:
    """Closest point on the capsule axis segment, then sphere-sphere
    (contact_point.hpp:406-438)."""
    dtype = xa.pos.dtype
    half = 0.5 * ca.length
    local = xa.apply_inverse_point(xb.pos)
    t = jnp.clip(local[..., 2], -half, half)
    seg_local = jnp.stack(
        [jnp.zeros_like(t), jnp.zeros_like(t), t], axis=-1
    )
    center = xa.apply_point(seg_local)
    c = sphere_sphere(
        Sphere(ca.radius), Transform(pos=center, rot=xa.rot), sb, xb
    )
    return c


# -- mesh narrowphase (beyond reference: geometry.hpp stops at the type id) --

import functools

import numpy as np


@functools.lru_cache(maxsize=64)
def _mesh_vertices(file_name: str, scale) -> np.ndarray:
    """Load + scale mesh vertices once per (file, scale); the array becomes
    a trace-time constant, so narrowphase stays statically shaped."""
    from tds_tpu.native.mesh import load_obj
    from tds_tpu.utils.file_utils import find_file

    with open(find_file(file_name)) as f:
        vertices, _ = load_obj(f.read())
    return np.asarray(vertices, np.float64) * np.asarray(scale, np.float64)


def _world_vertices(mesh: Mesh, xb: Transform):
    dtype = xb.pos.dtype
    verts = jnp.asarray(_mesh_vertices(mesh.file_name, mesh.scale), dtype)
    # one large (V,3) contraction — unlike the per-link 3x3s this is an
    # MXU-appropriate matmul, so einsum (dot_general) is the right form
    return jnp.einsum("...ij,vj->...vi", xb.rot, verts) + xb.pos[..., None, :]


def plane_mesh(pa: Plane, xa: Transform, mb: Mesh, xb: Transform) -> Contact:
    """K deepest mesh vertices vs the plane (K = mesh.max_contacts).

    The static-count + masking analog of the reference's 8-corner box
    probes; exact for convex-vertex contact against a plane (every
    mesh-plane contact point is a vertex)."""
    k = int(mb.max_contacts)
    n = jnp.asarray(pa.normal, dtype=xb.pos.dtype)
    w = _world_vertices(mb, xb)  # (…, V, 3)
    t = jnp.sum(w * n, axis=-1) - pa.constant  # (…, V) signed distances
    neg_t, idx = jax.lax.top_k(-t, k)  # deepest K
    point_b = jnp.take_along_axis(w, idx[..., None], axis=-2)
    distance = -neg_t
    point_a = point_b - distance[..., None] * n
    normal = jnp.broadcast_to(-n, point_b.shape)
    return Contact(
        normal_on_b=normal,
        point_a=point_a,
        point_b=point_b,
        distance=distance,
    )


def sphere_mesh(sa: Sphere, xa: Transform, mb: Mesh, xb: Transform) -> Contact:
    """K nearest mesh vertices vs a sphere (vertex-sampled narrowphase:
    exact when vertices dominate the closest features, an approximation on
    large flat faces — documented, like the reference's corner-sphere box
    approximations)."""
    from tds_tpu.algebra.spatial import safe_norm

    k = int(mb.max_contacts)
    w = _world_vertices(mb, xb)  # (…, V, 3)
    diff = xa.pos[..., None, :] - w  # center - vertex
    length = safe_norm(diff, axis=-1)
    neg_d, idx = jax.lax.top_k(-(length - sa.radius), k)
    distance = -neg_d
    point_b = jnp.take_along_axis(w, idx[..., None], axis=-2)
    d_sel = jnp.take_along_axis(diff, idx[..., None], axis=-2)
    l_sel = jnp.maximum(jnp.take_along_axis(length, idx, axis=-1), 1e-12)
    normal = d_sel / l_sel[..., None]  # from vertex toward sphere center
    point_a = xa.pos[..., None, :] - sa.radius * normal
    return Contact(
        normal_on_b=normal,
        point_a=point_a,
        point_b=point_b,
        distance=distance,
    )


def flip(contact: Contact) -> Contact:
    """Swap roles of a and b (the dispatcher's reversed-pair handling,
    contact_point.hpp:445-506)."""
    return Contact(
        normal_on_b=-contact.normal_on_b,
        point_a=contact.point_b,
        point_b=contact.point_a,
        distance=contact.distance,
    )


_PAIR_TABLE = {
    (Sphere, Sphere): (sphere_sphere, False),
    (Plane, Sphere): (plane_sphere, False),
    (Plane, Capsule): (plane_capsule, False),
    (Plane, Box): (plane_box, False),
    (Sphere, Box): (sphere_box, False),
    (Capsule, Sphere): (capsule_sphere, False),
    (Plane, Mesh): (plane_mesh, False),
    (Sphere, Mesh): (sphere_mesh, False),
    # reversed pairs
    (Sphere, Plane): (plane_sphere, True),
    (Capsule, Plane): (plane_capsule, True),
    (Box, Plane): (plane_box, True),
    (Box, Sphere): (sphere_box, True),
    (Sphere, Capsule): (capsule_sphere, True),
    (Mesh, Plane): (plane_mesh, True),
    (Mesh, Sphere): (sphere_mesh, True),
}


def supported(shape_a, shape_b) -> bool:
    # meshes collide only when opted in (max_contacts > 0); the default 0
    # preserves reference parity (visual-only meshes) for existing models
    for s in (shape_a, shape_b):
        if isinstance(s, Mesh) and s.max_contacts <= 0:
            return False
    return (type(shape_a), type(shape_b)) in _PAIR_TABLE


def compute_contacts(shape_a, xa: Transform, shape_b, xb: Transform) -> Contact:
    """Dispatch on static shape types; returns candidates with a-b roles
    matching the argument order (flipping reversed table entries)."""
    key = (type(shape_a), type(shape_b))
    if key not in _PAIR_TABLE:
        raise KeyError(f"unsupported collision pair {key}")
    fn, reversed_ = _PAIR_TABLE[key]
    if reversed_:
        return flip(fn(shape_b, xb, shape_a, xa))
    return fn(shape_a, xa, shape_b, xb)
