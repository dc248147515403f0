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
from tds_tpu.model.geometry import Box, Capsule, Heightfield, Mesh, Plane, Sphere


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
def _mesh_data(file_name: str, scale):
    """Load + scale mesh vertices/triangles once per (file, scale); both
    become trace-time constants, so narrowphase stays statically shaped."""
    from tds_tpu.native.mesh import load_obj
    from tds_tpu.utils.file_utils import find_file

    with open(find_file(file_name)) as f:
        vertices, triangles = load_obj(f.read())
    vertices = np.asarray(vertices, np.float64) * np.asarray(scale, np.float64)
    return vertices, np.asarray(triangles, np.int32)


def _mesh_vertices(file_name: str, scale) -> np.ndarray:
    return _mesh_data(file_name, scale)[0]


def _mesh_edges(file_name: str, scale) -> np.ndarray:
    """Unique undirected edges (E, 2) int32, a trace-time constant."""
    _, tris = _mesh_data(file_name, scale)
    e = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    e = np.sort(e, axis=1)
    return np.unique(e, axis=0).astype(np.int32)


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


def _closest_point_on_triangles(p, a, b, c):
    """Branchless closest point on each triangle (a,b,c) to point p.

    Ericson, Real-Time Collision Detection §5.1.5, with the region branches
    expressed as nested ``jnp.where`` — the same trace-safe discipline as
    the reference's ``where_*`` contact code (contact_point.hpp:238-327).
    Shapes: p (…, 1, 3) broadcast against triangle vertices (…, T, 3).
    """
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, axis=-1)
    d2 = jnp.sum(ac * ap, axis=-1)
    bp = p - b
    d3 = jnp.sum(ab * bp, axis=-1)
    d4 = jnp.sum(ac * bp, axis=-1)
    cp = p - c
    d5 = jnp.sum(ab * cp, axis=-1)
    d6 = jnp.sum(ac * cp, axis=-1)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    def safe(x):
        return jnp.where(jnp.abs(x) > 1e-30, x, 1e-30)

    # candidate points for each Voronoi region
    v_ab = (d1 / safe(d1 - d3))[..., None]
    p_ab = a + v_ab * ab
    w_ac = (d2 / safe(d2 - d6))[..., None]
    p_ac = a + w_ac * ac
    w_bc = ((d4 - d3) / safe((d4 - d3) + (d5 - d6)))[..., None]
    p_bc = b + w_bc * (c - b)
    denom = safe(va + vb + vc)
    p_face = a + (vb / denom)[..., None] * ab + (vc / denom)[..., None] * ac

    # region tests, applied innermost-last so earlier (vertex) regions win
    out = p_face
    in_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)
    out = jnp.where(in_bc[..., None], p_bc, out)
    in_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    out = jnp.where(in_ac[..., None], p_ac, out)
    in_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    out = jnp.where(in_ab[..., None], p_ab, out)
    out = jnp.where(((d6 >= 0) & (d5 <= d6))[..., None], c, out)
    out = jnp.where(((d3 >= 0) & (d4 <= d3))[..., None], b, out)
    out = jnp.where(((d1 <= 0) & (d2 <= 0))[..., None], a, out)
    return out


def sphere_mesh(sa: Sphere, xa: Transform, mb: Mesh, xb: Transform) -> Contact:
    """K nearest triangle closest-points vs a sphere (triangle-accurate:
    face, edge, and vertex contact all exact for a non-penetrating center).

    Distance is unsigned (center assumed outside the surface): contact
    activates when the sphere overlaps the surface, which is the regime the
    1 kHz impulse stepping keeps it in — the same shallow-contact envelope
    as the reference's corner-probe approximations. Adjacent triangles can
    report the same closest point; duplicates are redundant-but-harmless
    PGS rows, like the reference's coincident box-corner probes. Triangle
    degenerate to a point/segment is handled by the safe denominators."""
    from tds_tpu.algebra.spatial import safe_norm

    k = int(mb.max_contacts)
    verts, tris = _mesh_data(mb.file_name, mb.scale)
    w = _world_vertices(mb, xb)  # (…, V, 3)
    ta = jnp.take(w, jnp.asarray(tris[:, 0]), axis=-2)
    tb = jnp.take(w, jnp.asarray(tris[:, 1]), axis=-2)
    tc = jnp.take(w, jnp.asarray(tris[:, 2]), axis=-2)
    center = xa.pos[..., None, :]
    closest = _closest_point_on_triangles(center, ta, tb, tc)  # (…, T, 3)
    diff = center - closest
    length = safe_norm(diff, axis=-1)
    neg_d, idx = jax.lax.top_k(-(length - sa.radius), k)
    distance = -neg_d
    point_b = jnp.take_along_axis(closest, idx[..., None], axis=-2)
    d_sel = jnp.take_along_axis(diff, idx[..., None], axis=-2)
    l_sel = jnp.maximum(jnp.take_along_axis(length, idx, axis=-1), 1e-12)
    normal = d_sel / l_sel[..., None]  # from surface toward sphere center
    point_a = xa.pos[..., None, :] - sa.radius * normal
    return Contact(
        normal_on_b=normal,
        point_a=point_a,
        point_b=point_b,
        distance=distance,
    )


def _heightfield_cell_triangles(hf: Heightfield, i, j, dtype):
    """Local-frame vertices of cell (i, j)'s two triangles, matching
    utils.terrain.heightfield_obj's (a,b,d)/(a,d,c) triangulation.
    ``i``/``j`` are (…,)-shaped clipped cell indices."""
    x0, x1 = hf.x_range
    y0, y1 = hf.y_range
    dx = (x1 - x0) / (hf.nx - 1)
    dy = (y1 - y0) / (hf.ny - 1)
    h = jnp.asarray(hf.heights, dtype)
    xi = (x0 + i * dx).astype(dtype)
    yj = (y0 + j * dy).astype(dtype)

    def corner(di, dj):
        idx = (j + dj) * hf.nx + (i + di)
        z = jnp.take(h, idx)
        return jnp.stack([xi + di * dx, yj + dj * dy, z], axis=-1)

    pa = corner(0, 0)
    pb = corner(1, 0)
    pc = corner(0, 1)
    pd = corner(1, 1)
    # triangles (a, b, d) and (a, d, c)
    t_a = jnp.stack([pa, pa], axis=-2)
    t_b = jnp.stack([pb, pd], axis=-2)
    t_c = jnp.stack([pd, pc], axis=-2)
    return t_a, t_b, t_c


def heightfield_height(hf: Heightfield, x, y):
    """Exact height of the TRIANGULATED surface at local (x, y) — the same
    surface the contact sees (piecewise planar, not bilinear)."""
    x0, x1 = hf.x_range
    y0, y1 = hf.y_range
    dx = (x1 - x0) / (hf.nx - 1)
    dy = (y1 - y0) / (hf.ny - 1)
    fx = (x - x0) / dx
    fy = (y - y0) / dy
    i = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, hf.nx - 2)
    j = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, hf.ny - 2)
    u = fx - i
    v = fy - j
    h = jnp.asarray(hf.heights, jnp.result_type(x))

    def z(di, dj):
        return jnp.take(h, (j + dj) * hf.nx + (i + di))

    h00, h10, h01, h11 = z(0, 0), z(1, 0), z(0, 1), z(1, 1)
    lower = h00 + u * (h10 - h00) + v * (h11 - h10)  # triangle (a, b, d)
    upper = h00 + u * (h11 - h01) + v * (h01 - h00)  # triangle (a, d, c)
    return jnp.where(v <= u, lower, upper)


def sphere_heightfield(
    sa: Sphere, xa: Transform, hf: Heightfield, xb: Transform
) -> Contact:
    """Sphere vs heightfield: exact closest point over the 3x3 cell
    neighborhood of the center's cell (18 triangles) — O(1) regardless of
    grid size, identical to sphere_mesh on the equivalent triangulated
    mesh whenever the closest feature lies within one cell of the center
    (i.e. sphere radius < cell size, the terrain-walking regime)."""
    from tds_tpu.algebra.spatial import safe_norm

    k = int(hf.max_contacts)
    local = xb.apply_inverse_point(xa.pos)  # (…, 3)
    x0, x1 = hf.x_range
    y0, y1 = hf.y_range
    dx = (x1 - x0) / (hf.nx - 1)
    dy = (y1 - y0) / (hf.ny - 1)
    i0 = jnp.clip(
        jnp.floor((local[..., 0] - x0) / dx).astype(jnp.int32), 0, hf.nx - 2
    )
    j0 = jnp.clip(
        jnp.floor((local[..., 1] - y0) / dy).astype(jnp.int32), 0, hf.ny - 2
    )
    tas, tbs, tcs, valids = [], [], [], []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            ri = i0 + di
            rj = j0 + dj
            # clipped out-of-range neighbors would DUPLICATE a border
            # cell's triangles and corrupt the top-k multiset vs the mesh
            # oracle; mask them out instead
            valid = (
                (ri >= 0) & (ri <= hf.nx - 2) & (rj >= 0) & (rj <= hf.ny - 2)
            )
            ci = jnp.clip(ri, 0, hf.nx - 2)
            cj = jnp.clip(rj, 0, hf.ny - 2)
            ta, tb, tc = _heightfield_cell_triangles(
                hf, ci, cj, local.dtype
            )
            tas.append(ta)
            tbs.append(tb)
            tcs.append(tc)
            valids.append(jnp.stack([valid, valid], axis=-1))
    ta = jnp.concatenate(tas, axis=-2)  # (…, 18, 3)
    tb = jnp.concatenate(tbs, axis=-2)
    tc = jnp.concatenate(tcs, axis=-2)
    valid = jnp.concatenate(valids, axis=-1)  # (…, 18)
    center = local[..., None, :]
    closest = _closest_point_on_triangles(center, ta, tb, tc)
    diff = center - closest
    length = safe_norm(diff, axis=-1)
    length = jnp.where(valid, length, 1e30)
    neg_d, idx = jax.lax.top_k(-(length - sa.radius), k)
    distance = -neg_d
    p_sel = jnp.take_along_axis(closest, idx[..., None], axis=-2)
    d_sel = jnp.take_along_axis(diff, idx[..., None], axis=-2)
    l_sel = jnp.maximum(jnp.take_along_axis(length, idx, axis=-1), 1e-12)
    n_local = d_sel / l_sel[..., None]
    point_b = xb.apply_point(p_sel)
    normal = sm.mv(xb.rot[..., None, :, :], n_local)
    point_a = xa.pos[..., None, :] - sa.radius * normal
    return Contact(
        normal_on_b=normal,
        point_a=point_a,
        point_b=point_b,
        distance=distance,
    )


def capsule_heightfield(
    ca: Capsule, xa: Transform, hf: Heightfield, xb: Transform
) -> Contact:
    """Endpoint sphere probes, as capsule_mesh."""
    half = 0.5 * ca.length
    sphere = Sphere(ca.radius)
    pts = []
    for sz in (half, -half):
        local = jnp.asarray([0.0, 0.0, sz], dtype=xa.pos.dtype)
        center = xa.apply_point(local)
        pts.append(
            sphere_heightfield(
                sphere, Transform(pos=center, rot=xa.rot), hf, xb
            )
        )
    return Contact.concatenate(pts)


def capsule_mesh(ca: Capsule, xa: Transform, mb: Mesh, xb: Transform) -> Contact:
    """Two sphere probes at the capsule axis endpoints vs the mesh — the
    reference's own plane-capsule discipline (contact_point.hpp:128-161)
    applied to triangle meshes. Emits 2*max_contacts candidates."""
    half = 0.5 * ca.length
    sphere = Sphere(ca.radius)
    pts = []
    for sz in (half, -half):
        local = jnp.asarray([0.0, 0.0, sz], dtype=xa.pos.dtype)
        center = xa.apply_point(local)
        pts.append(
            sphere_mesh(sphere, Transform(pos=center, rot=xa.rot), mb, xb)
        )
    return Contact.concatenate(pts)


def box_mesh(ba: Box, xa: Transform, mb: Mesh, xb: Transform) -> Contact:
    """Eight shrunk corner-sphere probes vs the mesh — the reference's
    plane-box discipline (contact_point.hpp:164-198, corners
    geometry.hpp:244). Emits 8*max_contacts candidates."""
    r = max(1e-2, getattr(ba, "radius", 0.0) or 1e-2)
    sphere = Sphere(r)
    he = [0.5 * e - r for e in ba.extents]
    pts = []
    for sx in (1.0, -1.0):
        for sy in (1.0, -1.0):
            for sz in (1.0, -1.0):
                local = jnp.asarray(
                    [sx * he[0], sy * he[1], sz * he[2]], dtype=xa.pos.dtype
                )
                center = xa.apply_point(local)
                pts.append(
                    sphere_mesh(
                        sphere, Transform(pos=center, rot=xa.rot), mb, xb
                    )
                )
    return Contact.concatenate(pts)


def _triangle_normals(ta, tb, tc):
    """Outward unit normals assuming consistent CCW winding."""
    from tds_tpu.algebra.spatial import safe_norm

    n = jnp.cross(tb - ta, tc - ta)
    return n / jnp.maximum(safe_norm(n, axis=-1), 1e-12)[..., None]


def _probe_points_vs_mesh(p, mesh_surf: Mesh, xs: Transform, k: int):
    """K deepest of the probe points ``p`` (…, P, 3) against a mesh
    surface: branchless closest point over the triangles, penetration sign
    from the nearest triangle's outward normal (exact for convex surfaces,
    a good local test for well-formed closed meshes with consistent CCW
    winding). Returns (probe point, surface point, outward normal, signed
    distance), each top-k selected."""
    from tds_tpu.algebra.spatial import safe_norm

    verts, tris = _mesh_data(mesh_surf.file_name, mesh_surf.scale)
    w = _world_vertices(mesh_surf, xs)
    ta = jnp.take(w, jnp.asarray(tris[:, 0]), axis=-2)
    tb = jnp.take(w, jnp.asarray(tris[:, 1]), axis=-2)
    tc = jnp.take(w, jnp.asarray(tris[:, 2]), axis=-2)
    nrm = _triangle_normals(ta, tb, tc)  # (…, T, 3)
    # closest point of every triangle to every probe point
    closest = _closest_point_on_triangles(
        p[..., :, None, :], ta[..., None, :, :], tb[..., None, :, :],
        tc[..., None, :, :],
    )  # (…, P, T, 3)
    diff = p[..., :, None, :] - closest
    dist = safe_norm(diff, axis=-1)  # (…, P, T)
    tmin = jnp.argmin(dist, axis=-1)  # (…, P) nearest triangle
    d_near = jnp.take_along_axis(dist, tmin[..., None], axis=-1)[..., 0]
    c_near = jnp.take_along_axis(
        closest, tmin[..., None, None], axis=-2
    )[..., 0, :]
    nrm_b = jnp.broadcast_to(nrm[..., None, :, :], closest.shape)
    n_near = jnp.take_along_axis(
        nrm_b, tmin[..., None, None], axis=-2
    )[..., 0, :]
    side = jnp.sign(jnp.sum((p - c_near) * n_near, axis=-1))
    side = jnp.where(side == 0, 1.0, side)
    signed = side * d_near  # negative = probe inside the surface
    neg_sd, idx = jax.lax.top_k(-signed, k)
    distance = -neg_sd
    point_s = jnp.take_along_axis(c_near, idx[..., None], axis=-2)
    point_p = jnp.take_along_axis(p, idx[..., None], axis=-2)
    normal = jnp.take_along_axis(n_near, idx[..., None], axis=-2)
    return point_p, point_s, normal, distance


def _closest_point_segments(p1, q1, p2, q2, eps=1e-12):
    """Branchless closest points between segments [p1,q1] and [p2,q2]
    (Ericson, Real-Time Collision Detection 5.1.9, clamped form). All
    inputs broadcast; returns (c1 on segment 1, c2 on segment 2)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.sum(d1 * d1, axis=-1)
    e = jnp.sum(d2 * d2, axis=-1)
    f = jnp.sum(d2 * r, axis=-1)
    c = jnp.sum(d1 * r, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    denom = a * e - b * b
    # parallel (denom ~ 0) -> any s works; pick s=0 then solve t
    s = jnp.where(
        denom > eps, jnp.clip((b * f - c * e) / jnp.maximum(denom, eps), 0.0, 1.0), 0.0
    )
    t = jnp.clip((b * s + f) / jnp.maximum(e, eps), 0.0, 1.0)
    # re-solve s for the clamped t (keeps both points on their segments)
    s = jnp.clip((b * t - c) / jnp.maximum(a, eps), 0.0, 1.0)
    c1 = p1 + s[..., None] * d1
    c2 = p2 + t[..., None] * d2
    return c1, c2


def _world_edge_endpoints(mesh: Mesh, x: Transform):
    w = _world_vertices(mesh, x)
    edges = jnp.asarray(_mesh_edges(mesh.file_name, mesh.scale))
    return (
        jnp.take(w, edges[:, 0], axis=-2),
        jnp.take(w, edges[:, 1], axis=-2),
    )  # each (…, E, 3)


def mesh_mesh(ma: Mesh, xa: Transform, mbb: Mesh, xb: Transform) -> Contact:
    """Mesh-mesh contact, both directions (the reference has NO mesh
    narrowphase at all; this goes beyond it).

    Vertex candidates: each vertex of A probes B's surface (closest point
    over B's triangles, sign from the nearest triangle's outward normal),
    and symmetrically; max_contacts deepest per direction are emitted.
    Like every pair function here, candidates always exist and activity is
    decided by the distance mask downstream.

    Edge candidates (opt-in, ``edge_contacts`` on BOTH meshes): vertex
    sampling misses crossing-edge contact (two cubes meeting edge-on-edge
    have no vertex near the contact). For every edge pair the closest
    point on A's edge to B's edge becomes an ADAPTIVE probe point into B's
    surface — reducing edge-edge to the same signed-distance pipeline,
    with depth measured to the nearest face (for a 45-degree edge-on-edge
    cube stack: depth = dz/sqrt(2) against either adjacent face, the two
    directions' candidates bracketing the true normal). O(E_a*E_b*T);
    meant for small convex-ish meshes.

    Known limit: a probe point lying exactly ON the other surface (e.g.
    equal-size axis-aligned cubes whose side planes coincide) measures
    distance 0 to the coincident face, which can mask a deeper penetration
    through another face — probe-sampled signed distance is local. Scale-
    or pose-differentiated geometry (the generic case) behaves well."""
    k = int(max(ma.max_contacts, mbb.max_contacts))

    # A's vertices into B's surface: normal on b = B's outward normal
    pa1, pb1, n1, d1 = _probe_points_vs_mesh(
        _world_vertices(ma, xa), mbb, xb, k
    )
    c1 = Contact(normal_on_b=n1, point_a=pa1, point_b=pb1, distance=d1)
    # B's vertices into A's surface: computed with roles swapped, flip back
    pb2, pa2, n2, d2 = _probe_points_vs_mesh(
        _world_vertices(mbb, xb), ma, xa, k
    )
    c2 = Contact(normal_on_b=-n2, point_a=pa2, point_b=pb2, distance=d2)
    parts = [c1, c2]

    k_e = int(min(ma.edge_contacts, mbb.edge_contacts))
    if k_e > 0:
        a0, a1 = _world_edge_endpoints(ma, xa)
        b0, b1 = _world_edge_endpoints(mbb, xb)
        # all-pairs closest points: (…, Ea, Eb, 3)
        ca, cb = _closest_point_segments(
            a0[..., :, None, :], a1[..., :, None, :],
            b0[..., None, :, :], b1[..., None, :, :],
        )
        flat = ca.shape[:-3] + (-1, 3)
        pe1, se1, ne1, de1 = _probe_points_vs_mesh(
            ca.reshape(flat), mbb, xb, k_e
        )
        parts.append(
            Contact(normal_on_b=ne1, point_a=pe1, point_b=se1, distance=de1)
        )
        pe2, se2, ne2, de2 = _probe_points_vs_mesh(
            cb.reshape(flat), ma, xa, k_e
        )
        # probe points live on B here, surface points on A
        parts.append(
            Contact(normal_on_b=-ne2, point_a=se2, point_b=pe2, distance=de2)
        )
    return Contact.concatenate(parts)


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
    (Capsule, Mesh): (capsule_mesh, False),
    (Box, Mesh): (box_mesh, False),
    (Mesh, Mesh): (mesh_mesh, False),
    (Sphere, Heightfield): (sphere_heightfield, False),
    (Capsule, Heightfield): (capsule_heightfield, False),
    # reversed pairs
    (Sphere, Plane): (plane_sphere, True),
    (Capsule, Plane): (plane_capsule, True),
    (Box, Plane): (plane_box, True),
    (Box, Sphere): (sphere_box, True),
    (Sphere, Capsule): (capsule_sphere, True),
    (Mesh, Plane): (plane_mesh, True),
    (Mesh, Sphere): (sphere_mesh, True),
    (Mesh, Capsule): (capsule_mesh, True),
    (Mesh, Box): (box_mesh, True),
    (Heightfield, Sphere): (sphere_heightfield, True),
    (Heightfield, Capsule): (capsule_heightfield, True),
}


def supported(shape_a, shape_b) -> bool:
    # meshes collide only when opted in (max_contacts > 0); the default 0
    # preserves reference parity (visual-only meshes) for existing models
    for s in (shape_a, shape_b):
        if isinstance(s, (Mesh, Heightfield)) and s.max_contacts <= 0:
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
