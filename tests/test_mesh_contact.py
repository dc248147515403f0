"""Mesh narrowphase (beyond reference: the reference's geometry.hpp:30-38
defines a mesh type id with no narrowphase; plane/sphere-vs-mesh here are
original, opt-in via Mesh.max_contacts).

Oracle: a unit-cube OBJ, whose plane contacts are exactly its corners —
directly comparable to analytic corner positions under any rotation.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tds_tpu.algebra.transform import Transform
from tds_tpu.collision import narrowphase
from tds_tpu.contact.mlcp import ContactSolverParams
from tds_tpu.model.geometry import GeomAttachment, Mesh, Plane, Sphere
from tds_tpu.model.multibody import MultiBodyBuilder
from tds_tpu.world import build_world, make_ground_plane, world_step

# unit cube: vertices 1..8 = (-/+0.5)^3 in x-major order, 12 triangles
CUBE_OBJ = "\n".join(
    f"v {sx} {sy} {sz}"
    for sx in (-0.5, 0.5)
    for sy in (-0.5, 0.5)
    for sz in (-0.5, 0.5)
) + "\n" + "\n".join(
    f"f {a} {b} {c}"
    for a, b, c in [
        (1, 3, 7), (1, 7, 5),  # bottom z-
        (2, 6, 8), (2, 8, 4),  # top z+
        (1, 2, 4), (1, 4, 3),  # x-
        (5, 7, 8), (5, 8, 6),  # x+
        (1, 5, 6), (1, 6, 2),  # y-
        (3, 4, 8), (3, 8, 7),  # y+
    ]
) + "\n"


@pytest.fixture(scope="module")
def cube_mesh(tmp_path_factory):
    p = tmp_path_factory.mktemp("mesh") / "cube.obj"
    p.write_text(CUBE_OBJ)
    return Mesh(file_name=str(p), max_contacts=4)


def _identity(pos, dtype=jnp.float64):
    return Transform(
        pos=jnp.asarray(pos, dtype), rot=jnp.eye(3, dtype=dtype)
    )


def test_mesh_opt_in_gating(cube_mesh):
    plane = Plane((0.0, 0.0, 1.0), 0.0)
    visual_only = dataclasses.replace(cube_mesh, max_contacts=0)
    assert not narrowphase.supported(plane, visual_only)
    assert not narrowphase.supported(visual_only, plane)
    assert narrowphase.supported(plane, cube_mesh)
    assert narrowphase.supported(cube_mesh, plane)
    assert narrowphase.supported(Sphere(0.1), cube_mesh)


def test_plane_mesh_axis_aligned(cube_mesh):
    plane = Plane((0.0, 0.0, 1.0), 0.0)
    c = narrowphase.compute_contacts(
        plane, _identity((0, 0, 0)), cube_mesh, _identity((0, 0, 0.45))
    )
    assert c.count == 4
    # the four bottom corners, each penetrating by 0.05
    np.testing.assert_allclose(np.asarray(c.distance), -0.05, atol=1e-12)
    np.testing.assert_allclose(
        np.sort(np.asarray(c.point_b)[:, 2]), [-0.05] * 4, atol=1e-12
    )
    corners = {(round(float(x), 6), round(float(y), 6))
               for x, y, _ in np.asarray(c.point_b)}
    assert corners == {(-0.5, -0.5), (-0.5, 0.5), (0.5, -0.5), (0.5, 0.5)}
    np.testing.assert_allclose(
        np.asarray(c.normal_on_b), [[0, 0, -1.0]] * 4, atol=1e-12
    )


def test_plane_mesh_rotated_cube(cube_mesh):
    # 45 deg about x: the cube rests on an edge; the two deepest vertices
    # sit at z_center - sqrt(2)/2
    plane = Plane((0.0, 0.0, 1.0), 0.0)
    a = np.pi / 4
    rot = jnp.asarray(
        [[1, 0, 0],
         [0, np.cos(a), -np.sin(a)],
         [0, np.sin(a), np.cos(a)]], jnp.float64
    )
    z0 = 0.65
    c = narrowphase.compute_contacts(
        plane, _identity((0, 0, 0)), cube_mesh,
        Transform(pos=jnp.asarray([0.0, 0.0, z0], jnp.float64), rot=rot),
    )
    d = np.sort(np.asarray(c.distance))
    expected_deepest = z0 - np.sqrt(2.0) / 2.0
    np.testing.assert_allclose(d[:2], expected_deepest, atol=1e-12)
    # next four vertices sit exactly at z0 (the cube's mid-height ring)
    np.testing.assert_allclose(d[2:4], z0, atol=1e-12)


def test_plane_mesh_matches_mesh_plane_flip(cube_mesh):
    plane = Plane((0.0, 0.0, 1.0), 0.0)
    xp, xm = _identity((0, 0, 0)), _identity((0, 0, 0.4))
    ab = narrowphase.compute_contacts(plane, xp, cube_mesh, xm)
    ba = narrowphase.compute_contacts(cube_mesh, xm, plane, xp)
    np.testing.assert_allclose(
        np.asarray(ab.normal_on_b), -np.asarray(ba.normal_on_b)
    )
    np.testing.assert_allclose(np.asarray(ab.point_a), np.asarray(ba.point_b))
    np.testing.assert_allclose(np.asarray(ab.distance), np.asarray(ba.distance))


def test_sphere_mesh_vertex_contact(cube_mesh):
    one = dataclasses.replace(cube_mesh, max_contacts=1)
    sphere = Sphere(0.25)
    # sphere centered above the (0.5, 0.5, 0.5) corner: the closest
    # feature is that vertex
    c = narrowphase.compute_contacts(
        sphere, _identity((0.5, 0.5, 1.0)), one, _identity((0, 0, 0))
    )
    assert c.count == 1
    np.testing.assert_allclose(
        np.asarray(c.point_b)[0], [0.5, 0.5, 0.5], atol=1e-12
    )
    np.testing.assert_allclose(float(c.distance[0]), 0.5 - 0.25, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(c.normal_on_b)[0], [0, 0, 1.0], atol=1e-12
    )


def test_sphere_mesh_face_contact(cube_mesh):
    # sphere above the top-face CENTER: no vertex nearby — the
    # triangle-accurate narrowphase must find the interior face point
    # (a vertex-sampled one reports sqrt(0.5^2+0.5^2+0.2^2)-r ~ 0.48)
    one = dataclasses.replace(cube_mesh, max_contacts=1)
    sphere = Sphere(0.1)
    c = narrowphase.compute_contacts(
        sphere, _identity((0.0, 0.0, 0.7)), one, _identity((0, 0, 0))
    )
    np.testing.assert_allclose(
        np.asarray(c.point_b)[0], [0.0, 0.0, 0.5], atol=1e-12
    )
    np.testing.assert_allclose(float(c.distance[0]), 0.2 - 0.1, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(c.normal_on_b)[0], [0, 0, 1.0], atol=1e-12
    )
    # overlapping case activates (negative distance)
    c2 = narrowphase.compute_contacts(
        sphere, _identity((0.1, -0.2, 0.55)), one, _identity((0, 0, 0))
    )
    np.testing.assert_allclose(float(c2.distance[0]), 0.05 - 0.1, atol=1e-12)


def test_sphere_mesh_edge_contact(cube_mesh):
    # sphere beside the top x+ edge (x=0.5, z=0.5), offset diagonally
    one = dataclasses.replace(cube_mesh, max_contacts=1)
    sphere = Sphere(0.05)
    d = 0.3
    c = narrowphase.compute_contacts(
        sphere, _identity((0.5 + d, 0.1, 0.5 + d)), one, _identity((0, 0, 0))
    )
    np.testing.assert_allclose(
        np.asarray(c.point_b)[0], [0.5, 0.1, 0.5], atol=1e-12
    )
    np.testing.assert_allclose(
        float(c.distance[0]), d * np.sqrt(2.0) - 0.05, atol=1e-12
    )
    expected_n = np.asarray([1.0, 0.0, 1.0]) / np.sqrt(2.0)
    np.testing.assert_allclose(
        np.asarray(c.normal_on_b)[0], expected_n, atol=1e-12
    )


def test_capsule_mesh_endpoint_probes(cube_mesh):
    from tds_tpu.model.geometry import Capsule

    one = dataclasses.replace(cube_mesh, max_contacts=1)
    # vertical capsule above the top face: bottom endpoint probe closest
    cap = Capsule(radius=0.1, length=0.4)
    c = narrowphase.compute_contacts(
        cap, _identity((0.0, 0.0, 0.9)), one, _identity((0, 0, 0))
    )
    assert c.count == 2
    d = np.sort(np.asarray(c.distance))
    # bottom endpoint center z=0.7: dist = 0.2 - 0.1; top z=1.1: 0.6 - 0.1
    np.testing.assert_allclose(d, [0.1, 0.5], atol=1e-12)


def test_box_mesh_corner_probes(cube_mesh):
    from tds_tpu.model.geometry import Box

    one = dataclasses.replace(cube_mesh, max_contacts=1)
    box = Box((0.2, 0.2, 0.2))
    # small box hovering 0.05 above the top face center
    c = narrowphase.compute_contacts(
        box, _identity((0.0, 0.0, 0.65)), one, _identity((0, 0, 0))
    )
    assert c.count == 8
    d = np.sort(np.asarray(c.distance))
    # 4 bottom corner-sphere probes (r=0.01, shrunk half-extent 0.09):
    # centers z=0.56 -> distance 0.06-0.01=0.05; top probes z=0.74 -> 0.23
    np.testing.assert_allclose(d[:4], 0.05, atol=1e-9)
    np.testing.assert_allclose(d[4:], 0.23, atol=1e-9)


def test_mesh_mesh_separated_and_penetrating(cube_mesh):
    m = dataclasses.replace(cube_mesh, max_contacts=4)
    # a half-size cube above a unit cube (equal sizes would put probe
    # vertices exactly on the lower cube's side planes — the documented
    # coincident-face degeneracy)
    small = dataclasses.replace(m, scale=(0.5, 0.5, 0.5))
    # separated by 0.05: all distances positive (no activation)
    c = narrowphase.compute_contacts(
        small, _identity((0, 0, 0.80)), m, _identity((0, 0, 0))
    )
    assert c.count == 8  # 4 per direction
    assert float(jnp.min(c.distance)) > 0.045
    # overlapping by 0.05: the small cube's 4 bottom vertices are inside
    c2 = narrowphase.compute_contacts(
        small, _identity((0, 0, 0.70)), m, _identity((0, 0, 0))
    )
    d2 = np.sort(np.asarray(c2.distance))
    np.testing.assert_allclose(d2[:4], -0.05, atol=1e-9)
    # normals on b point up (+z, out of the lower cube) for the deepest 4
    order = np.argsort(np.asarray(c2.distance))[:4]
    normals = np.asarray(c2.normal_on_b)[order]
    np.testing.assert_allclose(normals[:, 2], 1.0, atol=1e-9)


def test_mesh_cube_stacks_on_static_mesh_cube(cube_mesh):
    # end-to-end mesh-vs-mesh: a dynamic mesh cube dropped onto a STATIC
    # mesh cube settles stacked (the reference has no mesh narrowphase at
    # all, let alone mesh-mesh)
    m = dataclasses.replace(cube_mesh, max_contacts=4)
    # dynamic cube is 0.6-scale so its vertices stay off the static cube's
    # side planes (see the coincident-face note in mesh_mesh)
    small = dataclasses.replace(m, scale=(0.6, 0.6, 0.6))
    b = MultiBodyBuilder(is_floating=True, name="mesh_cube_dyn")
    b.set_base_inertia(1.0, (0, 0, 0), np.diag([0.36 / 6.0] * 3))
    cube = b.finalize()
    static_model = MultiBodyBuilder(name="mesh_cube_static").finalize()
    static_geom = GeomAttachment(
        link_index=-1, shape=m, pos=(0.0, 0.0, 0.5), friction=0.8
    )
    dyn_geom = GeomAttachment(link_index=-1, shape=small, friction=0.8)
    world = build_world(
        [(static_model, (static_geom,)), (cube, (dyn_geom,))],
        solver=ContactSolverParams(friction=0.8, restitution=0.0),
    )
    q = cube.zero_q().at[6].set(1.35)
    qs, qds = (jnp.zeros(0), q), (jnp.zeros(0), cube.zero_qd())
    taus = (jnp.zeros(0), jnp.zeros(0))
    gravity = jnp.asarray([0.0, 0.0, -9.81])

    def step(carry, _):
        qs, qds = carry
        qs, qds = world_step(world, qs, qds, taus, gravity, 1e-3)
        return (qs, qds), None

    (qs, qds), _ = jax.lax.scan(step, (qs, qds), None, length=1200)
    qf, qdf = np.asarray(qs[1]), np.asarray(qds[1])
    assert np.all(np.isfinite(qf))
    assert abs(qf[6] - 1.3) < 0.03, f"stack height z={qf[6]:.4f}, expected ~1.3"
    assert np.max(np.abs(qdf)) < 0.1, "stacked cube did not come to rest"


def test_batched_plane_mesh_matches_loop(cube_mesh):
    plane = Plane((0.0, 0.0, 1.0), 0.0)
    zs = jnp.asarray([0.3, 0.45, 0.7, 1.2], jnp.float64)

    def single(z):
        pos = jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), z], axis=-1)
        x = Transform(pos=pos, rot=jnp.eye(3, dtype=jnp.float64))
        return narrowphase.compute_contacts(
            plane, _identity((0, 0, 0)), cube_mesh, x
        )

    batched = jax.vmap(single)(zs)
    for i, z in enumerate(zs):
        one = single(z)
        np.testing.assert_allclose(
            np.asarray(batched.distance)[i], np.asarray(one.distance)
        )


def test_mesh_cube_settles_on_plane(cube_mesh):
    # end-to-end: a rigid cube (mesh collision) dropped on the ground
    # through the full MLCP pipeline settles with its bottom face at z=0
    b = MultiBodyBuilder(is_floating=True, name="mesh_cube")
    mass = 1.0
    inertia = mass / 6.0  # solid cube, edge 1
    b.set_base_inertia(mass, (0, 0, 0), np.diag([inertia] * 3))
    cube = b.finalize()
    geom = GeomAttachment(
        link_index=-1, shape=cube_mesh, friction=0.8, restitution=0.0
    )
    plane_model, plane_geoms = make_ground_plane()
    world = build_world(
        [(plane_model, plane_geoms), (cube, (geom,))],
        solver=ContactSolverParams(friction=0.8, restitution=0.0),
    )
    q = cube.zero_q().at[6].set(0.55)
    qs, qds = (jnp.zeros(0), q), (jnp.zeros(0), cube.zero_qd())
    taus = (jnp.zeros(0), jnp.zeros(0))
    gravity = jnp.asarray([0.0, 0.0, -9.81])

    def step(carry, _):
        qs, qds = carry
        qs, qds = world_step(world, qs, qds, taus, gravity, 1e-3)
        return (qs, qds), None

    (qs, qds), _ = jax.lax.scan(step, (qs, qds), None, length=1500)
    qf, qdf = np.asarray(qs[1]), np.asarray(qds[1])
    assert np.all(np.isfinite(qf))
    assert abs(qf[6] - 0.5) < 0.02, f"cube center z={qf[6]:.4f}, expected ~0.5"
    assert np.max(np.abs(qdf)) < 0.05, "cube did not come to rest"
    # no rotation should have accumulated (flat drop)
    np.testing.assert_allclose(qf[0:4], [0, 0, 0, 1.0], atol=5e-3)


def test_urdf_mesh_contacts_opt_in(cube_mesh, tmp_path):
    # construct(..., mesh_contacts=K) opts URDF collision meshes into the
    # narrowphase; the default keeps them visual-only (reference parity)
    from tds_tpu.urdf.cache import construct_from_string

    urdf = f"""
    <robot name="meshbot">
      <link name="base">
        <inertial>
          <mass value="1.0"/>
          <inertia ixx="0.1" iyy="0.1" izz="0.1" ixy="0" ixz="0" iyz="0"/>
        </inertial>
        <collision>
          <geometry><mesh filename="{cube_mesh.file_name}"/></geometry>
        </collision>
      </link>
    </robot>"""
    _, geoms0 = construct_from_string(urdf)
    assert geoms0 == ()  # reference parity: collision meshes ignored
    plane = Plane((0.0, 0.0, 1.0), 0.0)

    _, geoms2 = construct_from_string(urdf, mesh_contacts=2)
    assert geoms2[0].shape.max_contacts == 2
    assert narrowphase.supported(plane, geoms2[0].shape)
    c = narrowphase.compute_contacts(
        plane, _identity((0, 0, 0)), geoms2[0].shape, _identity((0, 0, 0.4))
    )
    assert c.count == 2
    np.testing.assert_allclose(np.asarray(c.distance), -0.1, atol=1e-12)


def test_mesh_narrowphase_gradients_match_fd(cube_mesh, tmp_path):
    # the where-chain closest-point-on-triangle must be cleanly
    # differentiable (no NaN subgradients at region boundaries we don't
    # sit on): grad of min contact distance wrt sphere position and mesh
    # rotation vs central finite differences
    import math

    from tds_tpu.utils.terrain import write_heightfield

    path = write_heightfield(
        str(tmp_path / "grad_terrain.obj"), 7, 7, (-1, 1), (-1, 1),
        lambda x, y: 0.1 * math.sin(2 * x) * math.cos(y),
    )
    m = Mesh(file_name=path, max_contacts=3)
    eye = jnp.eye(3, dtype=jnp.float64)
    origin = Transform(pos=jnp.zeros(3, jnp.float64), rot=eye)

    def min_dist(p):
        c = narrowphase.compute_contacts(
            Sphere(0.05), Transform(pos=p, rot=eye), m, origin
        )
        return jnp.min(c.distance)

    p0 = jnp.asarray([0.13, -0.21, 0.4], jnp.float64)
    g = np.asarray(jax.grad(min_dist)(p0))
    eps = 1e-6
    fd = np.array([
        (min_dist(p0.at[i].add(eps)) - min_dist(p0.at[i].add(-eps)))
        / (2 * eps)
        for i in range(3)
    ])
    np.testing.assert_allclose(g, fd, atol=1e-8)

    def dist_vs_rotation(theta):
        c, s = jnp.cos(theta), jnp.sin(theta)
        rot = jnp.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1.0]], jnp.float64)
        cc = narrowphase.compute_contacts(
            Sphere(0.05), Transform(pos=p0, rot=eye), m,
            Transform(pos=jnp.zeros(3, jnp.float64), rot=rot),
        )
        return jnp.min(cc.distance)

    th = jnp.asarray(0.3, jnp.float64)
    g2 = float(jax.grad(dist_vs_rotation)(th))
    fd2 = float(
        (dist_vs_rotation(th + eps) - dist_vs_rotation(th - eps)) / (2 * eps)
    )
    assert abs(g2 - fd2) < 1e-8


def test_mesh_local_inertia_matches_analytic_cube(cube_mesh):
    # solid unit cube of mass m: I = m/6 on the diagonal
    ixx, iyy, izz = cube_mesh.local_inertia(2.4)
    np.testing.assert_allclose([ixx, iyy, izz], 2.4 / 6.0, rtol=1e-9)
    # missing file falls back to zeros (visual-only meshes stay harmless)
    assert Mesh(file_name="/nonexistent.obj").local_inertia(1.0) == (0, 0, 0)


def test_ray_mesh_moller_trumbore(cube_mesh):
    from tds_tpu.collision.raycast import cast_rays, ray_mesh

    eye = jnp.eye(3, dtype=jnp.float64)
    x = Transform(pos=jnp.zeros(3, jnp.float64), rot=eye)
    # straight down onto the top face: hits z=0.5
    o = jnp.asarray([0.1, -0.2, 2.0])
    tgt = jnp.asarray([0.1, -0.2, 0.0])
    t, n = ray_mesh(o, tgt, cube_mesh, x)
    np.testing.assert_allclose(float(t), 0.75, atol=1e-12)  # 2.0 -> 0.5
    np.testing.assert_allclose(np.asarray(n), [0, 0, 1.0], atol=1e-12)
    # miss: ray beside the cube
    t2, _ = ray_mesh(jnp.asarray([2.0, 2.0, 2.0]),
                     jnp.asarray([2.0, 2.0, 0.0]), cube_mesh, x)
    assert float(t2) > 1e29
    # batched grid scan through cast_rays (LIDAR-style height sensing)
    xs = jnp.linspace(-0.8, 0.8, 9)
    origins = jnp.stack([xs, jnp.zeros(9), jnp.full((9,), 2.0)], axis=-1)
    targets = origins.at[:, 2].set(-1.0)
    hit = cast_rays(origins, targets, [cube_mesh], [x])
    frac = np.asarray(hit.fraction)
    inside = np.abs(np.asarray(xs)) <= 0.5
    # over the cube: hit at z=0.5 -> fraction 0.5; outside: no cube hit
    np.testing.assert_allclose(frac[inside], 0.5, atol=1e-12)
    assert np.all(frac[~inside] > 1.0)
    assert np.all(np.asarray(hit.geom_index)[inside] == 0)


def test_mesh_cube_settles_with_spring_solver(cube_mesh):
    # mesh contacts are solver-agnostic: the penalty spring-damper path
    # settles the cube too (z -> 0.4997 with default spring stiffness)
    b = MultiBodyBuilder(is_floating=True, name="mesh_cube_spring")
    b.set_base_inertia(1.0, (0, 0, 0), np.diag([1.0 / 6.0] * 3))
    cube = b.finalize()
    geom = GeomAttachment(link_index=-1, shape=cube_mesh, friction=0.8)
    pm, pg = make_ground_plane()
    world = build_world([(pm, pg), (cube, (geom,))], contact_model="spring")
    q = cube.zero_q().at[6].set(0.55)
    qs, qds = (jnp.zeros(0), q), (jnp.zeros(0), cube.zero_qd())
    taus = (jnp.zeros(0), jnp.zeros(0))
    gravity = jnp.asarray([0.0, 0.0, -9.81])

    def step(carry, _):
        qs, qds = carry
        qs, qds = world_step(world, qs, qds, taus, gravity, 1e-3)
        return (qs, qds), None

    (qs, qds), _ = jax.lax.scan(step, (qs, qds), None, length=1500)
    qf = np.asarray(qs[1])
    assert np.all(np.isfinite(qf))
    assert abs(qf[6] - 0.5) < 0.01
    assert np.max(np.abs(np.asarray(qds[1]))) < 1e-6


def test_closest_point_on_triangle_property(cube_mesh):
    # property test: for 500 random triangle/point pairs the branchless
    # region selection returns the true minimum (never beaten by a dense
    # 200x200 barycentric sampling of the triangle)
    from tds_tpu.collision.narrowphase import _closest_point_on_triangles

    rng = np.random.default_rng(0)
    n = 500
    a = rng.normal(size=(n, 3))
    b = rng.normal(size=(n, 3))
    c = rng.normal(size=(n, 3))
    p = rng.normal(size=(n, 3)) * 2.0
    cp = np.asarray(
        _closest_point_on_triangles(
            jnp.asarray(p), jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
        )
    )
    d_fast = np.linalg.norm(p - cp, axis=-1)
    m = 200
    u = np.linspace(0, 1, m)
    uu, vv = np.meshgrid(u, u)
    keep = (uu + vv) <= 1.0
    uu, vv = uu[keep], vv[keep]
    for i in range(n):
        pts = (
            a[i]
            + uu[:, None] * (b[i] - a[i])
            + vv[:, None] * (c[i] - a[i])
        )
        d_bf = np.min(np.linalg.norm(pts - p[i], axis=-1))
        assert d_fast[i] <= d_bf + 1e-9, (i, d_fast[i], d_bf)


# -- edge-edge candidates (opt-in via Mesh.edge_contacts) -------------------


def _roty45(dtype=jnp.float64):
    c = 1.0 / np.sqrt(2.0)
    return jnp.asarray([[c, 0, c], [0, 1, 0], [-c, 0, c]], dtype)


def _rotx45(dtype=jnp.float64):
    c = 1.0 / np.sqrt(2.0)
    return jnp.asarray([[1, 0, 0], [0, c, -c], [0, c, c]], dtype)


def _edge_cross_setup(cube_mesh, delta, edge_contacts):
    """Lower cube rotated 45 deg about y (top feature: an edge along y at
    z=sqrt(2)/2); upper cube rotated 45 deg about x (bottom feature: an
    edge along x), lowered by ``delta`` past touching. The edges CROSS at
    (0,0): no vertex of either cube is near the contact."""
    m = dataclasses.replace(
        cube_mesh, max_contacts=4, edge_contacts=edge_contacts
    )
    xb = Transform(pos=jnp.zeros(3, jnp.float64), rot=_roty45())
    za = np.sqrt(2.0) - delta
    xa = Transform(pos=jnp.asarray([0.0, 0.0, za], jnp.float64), rot=_rotx45())
    return narrowphase.compute_contacts(m, xa, m, xb)


def test_mesh_mesh_vertex_sampling_misses_edge_cross(cube_mesh):
    # the documented gap: with vertex candidates only, the crossing-edge
    # penetration is invisible (every vertex is outside the other cube)
    c = _edge_cross_setup(cube_mesh, delta=0.02, edge_contacts=0)
    assert float(jnp.min(c.distance)) > 0.0


def test_mesh_mesh_edge_candidates_catch_edge_cross(cube_mesh):
    # analytic oracle: penetration delta along z measures delta/sqrt(2)
    # against either adjacent 45-degree face, normal z-component 1/sqrt(2)
    delta = 0.02
    c = _edge_cross_setup(cube_mesh, delta=delta, edge_contacts=2)
    d = np.asarray(c.distance)
    i = int(np.argmin(d))
    np.testing.assert_allclose(d[i], -delta / np.sqrt(2.0), atol=1e-9)
    n = np.asarray(c.normal_on_b)[i]
    # normal on the lower cube points UP toward the upper cube
    np.testing.assert_allclose(n[2], 1.0 / np.sqrt(2.0), atol=1e-9)
    # contact sits at the edge crossing, not at any cube vertex (the
    # surface point is the probe projected onto the 45-degree face, which
    # shifts x by delta/2)
    p = np.asarray(c.point_b)[i]
    assert abs(p[0]) <= delta and abs(p[1]) <= delta
    assert np.allclose(p[2], np.sqrt(2.0) / 2.0, atol=delta)


def test_mesh_mesh_edge_candidates_separated_gap(cube_mesh):
    # separated by a small gap: the closest features are the two crossing
    # edges themselves, exactly ``gap`` apart — and the probe measures
    # exactly that (closest-point-on-triangle includes the edges)
    gap = 0.03
    c = _edge_cross_setup(cube_mesh, delta=-gap, edge_contacts=2)
    d = float(jnp.min(c.distance))
    np.testing.assert_allclose(d, gap, atol=1e-9)


def test_mesh_mesh_edge_opt_in_shape(cube_mesh):
    # contact count is static: 2*max_contacts (+ 2*edge_contacts when on)
    base = _edge_cross_setup(cube_mesh, delta=0.02, edge_contacts=0)
    assert base.count == 8
    on = _edge_cross_setup(cube_mesh, delta=0.02, edge_contacts=3)
    assert on.count == 8 + 6
