"""Contact pipeline tests: narrowphase geometry, MLCP/PGS resolution,
world stepping (ball drop, bounce, friction), batching.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tds_tpu.algebra.transform import Transform
from tds_tpu.collision import narrowphase
from tds_tpu.contact.mlcp import ContactSolverParams, plane_space
from tds_tpu.model.geometry import Box, Capsule, GeomAttachment, Plane, Sphere
from tds_tpu.model.joints import JointType
from tds_tpu.model.multibody import MultiBodyBuilder
from tds_tpu.world import World, build_world, make_ground_plane, world_step

GRAVITY = jnp.array([0.0, 0.0, -9.81])


def xf(pos, rot=None):
    pos = jnp.asarray(pos, dtype=jnp.float64)
    if rot is None:
        rot = jnp.eye(3, dtype=jnp.float64)
    return Transform(pos=pos, rot=rot)


class TestNarrowphase:
    def test_sphere_sphere(self):
        c = narrowphase.sphere_sphere(
            Sphere(0.5), xf([0, 0, 2.0]), Sphere(0.5), xf([0, 0, 1.2])
        )
        np.testing.assert_allclose(c.distance, [-0.2], atol=1e-12)
        np.testing.assert_allclose(c.normal_on_b[0], [0, 0, 1], atol=1e-12)
        np.testing.assert_allclose(c.point_a[0], [0, 0, 1.5], atol=1e-12)

    def test_plane_sphere(self):
        c = narrowphase.plane_sphere(
            Plane(), xf([0, 0, 0]), Sphere(0.5), xf([1.0, 2.0, 0.3])
        )
        np.testing.assert_allclose(c.distance, [-0.2], atol=1e-12)
        # reference convention: world_normal_on_b = -plane_normal
        np.testing.assert_allclose(c.normal_on_b[0], [0, 0, -1], atol=1e-12)
        np.testing.assert_allclose(c.point_b[0], [1, 2, -0.2], atol=1e-12)
        np.testing.assert_allclose(c.point_a[0], [1, 2, 0.0], atol=1e-12)

    def test_plane_capsule_two_points(self):
        c = narrowphase.plane_capsule(
            Plane(), xf([0, 0, 0]), Capsule(0.1, 0.8), xf([0, 0, 0.05])
        )
        assert c.count == 2
        # lying? capsule axis is z: endpoints at z=0.45 and z=-0.35
        np.testing.assert_allclose(
            np.sort(np.asarray(c.distance)), [-0.45, 0.35], atol=1e-12
        )

    def test_plane_box_eight_corners(self):
        c = narrowphase.plane_box(
            Plane(), xf([0, 0, 0]), Box((0.2, 0.2, 0.2)), xf([0, 0, 0.05])
        )
        assert c.count == 8
        d = np.sort(np.asarray(c.distance))
        # four corners penetrate, four are above
        assert (d < 0).sum() == 4 and (d > 0).sum() == 4

    def test_sphere_box_outside_and_inside(self):
        c = narrowphase.sphere_box(
            Sphere(0.1), xf([0.35, 0, 0]), Box((0.4, 0.4, 0.4)), xf([0, 0, 0])
        )
        np.testing.assert_allclose(c.distance, [0.15 - 0.1], atol=1e-12)
        np.testing.assert_allclose(c.normal_on_b[0], [1, 0, 0], atol=1e-12)
        # center inside the box -> face projection, negative center distance
        c2 = narrowphase.sphere_box(
            Sphere(0.05), xf([0.15, 0, 0]), Box((0.4, 0.4, 0.4)), xf([0, 0, 0])
        )
        np.testing.assert_allclose(c2.distance, [-0.05 - 0.05], atol=1e-12)
        np.testing.assert_allclose(c2.normal_on_b[0], [1, 0, 0], atol=1e-12)

    def test_capsule_sphere(self):
        c = narrowphase.capsule_sphere(
            Capsule(0.1, 1.0), xf([0, 0, 0]), Sphere(0.2), xf([0.25, 0, 0.3])
        )
        np.testing.assert_allclose(c.distance, [-0.05], atol=1e-12)
        np.testing.assert_allclose(c.normal_on_b[0], [-1, 0, 0], atol=1e-12)

    def test_dispatch_flip(self):
        a = narrowphase.compute_contacts(
            Plane(), xf([0, 0, 0]), Sphere(0.5), xf([0, 0, 0.3])
        )
        b = narrowphase.compute_contacts(
            Sphere(0.5), xf([0, 0, 0.3]), Plane(), xf([0, 0, 0])
        )
        np.testing.assert_allclose(a.distance, b.distance)
        np.testing.assert_allclose(a.normal_on_b, -b.normal_on_b)
        np.testing.assert_allclose(a.point_a, b.point_b)

    def test_plane_space_orthonormal(self):
        for n in ([0, 0, 1.0], [0, 1.0, 0], [0.6, 0, 0.8], [0.36, 0.48, 0.8]):
            nv = jnp.asarray(n, dtype=jnp.float64)
            p, q = plane_space(nv)
            np.testing.assert_allclose(jnp.dot(p, nv), 0, atol=1e-12)
            np.testing.assert_allclose(jnp.dot(q, nv), 0, atol=1e-12)
            np.testing.assert_allclose(jnp.dot(p, q), 0, atol=1e-12)
            np.testing.assert_allclose(jnp.linalg.norm(p), 1, atol=1e-12)
            np.testing.assert_allclose(jnp.linalg.norm(q), 1, atol=1e-12)


def _ball_world(radius=0.5, mass=1.0, friction=0.5, restitution=0.0, solver=None):
    b = MultiBodyBuilder(is_floating=True, name="ball")
    inertia = 0.4 * mass * radius**2
    b.set_base_inertia(mass, (0, 0, 0), np.diag([inertia] * 3))
    ball = b.finalize()
    ball_geom = GeomAttachment(
        link_index=-1, shape=Sphere(radius), friction=friction, restitution=restitution
    )
    plane_model, plane_geoms = make_ground_plane()
    solver = solver or ContactSolverParams(
        friction=friction, restitution=restitution
    )
    world = build_world(
        [(plane_model, plane_geoms), (ball, (ball_geom,))], solver=solver
    )
    return world, ball


def _simulate(world, ball, z0, qd0=None, steps=1000, dt=1e-3):
    q = ball.zero_q().at[6].set(z0)
    qd = ball.zero_qd() if qd0 is None else qd0
    qs = (jnp.zeros(0), q)
    qds = (jnp.zeros(0), qd)
    taus = (jnp.zeros(0), jnp.zeros(0))

    def step(carry, _):
        qs, qds = carry
        qs, qds = world_step(world, qs, qds, taus, GRAVITY, dt)
        return (qs, qds), (qs[1], qds[1])

    (qs, qds), traj = jax.lax.scan(step, (qs, qds), None, length=steps)
    return qs[1], qds[1], traj


def test_ball_settles_on_plane():
    world, ball = _ball_world(radius=0.5)
    q, qd, traj = _simulate(world, ball, z0=0.6, steps=1500)
    assert np.all(np.isfinite(np.asarray(q)))
    # settles near z = radius, nearly at rest
    assert abs(float(q[6]) - 0.5) < 0.02
    assert abs(float(qd[5])) < 0.05
    # never tunnels through the floor
    assert float(jnp.min(traj[0][:, 6])) > 0.4


def test_ball_bounces_with_restitution():
    world, ball = _ball_world(radius=0.5, restitution=0.8)
    q, qd, traj = _simulate(world, ball, z0=1.5, steps=900)
    zs = np.asarray(traj[0][:, 6])
    # finds a bounce: after hitting the ground it goes back up significantly
    i_floor = int(np.argmin(zs))
    assert zs[i_floor] < 0.55
    assert zs[i_floor:].max() > 0.8  # bounced back up


def test_friction_transitions_sliding_to_rolling():
    """A solid sphere sliding on a frictional plane must transition to
    rolling without slipping at exactly v = 5/7 v0 (classic analytic
    result), then roll at constant speed."""
    world, ball = _ball_world(radius=0.5, friction=0.8)
    qd0 = ball.zero_qd().at[3].set(2.0)  # sliding in +x
    q, qd, traj = _simulate(world, ball, z0=0.5, qd0=qd0, steps=1500)
    v_roll = 2.0 * 5.0 / 7.0
    np.testing.assert_allclose(float(qd[3]), v_roll, rtol=1e-2)
    # rolling without slipping: omega_y = v / r
    np.testing.assert_allclose(float(qd[1]), v_roll / 0.5, rtol=1e-2)

    world0, ball0 = _ball_world(radius=0.5, friction=0.0)
    q0, qd0_end, _ = _simulate(world0, ball0, z0=0.5, qd0=qd0, steps=1500)
    # frictionless keeps sliding
    assert abs(float(qd0_end[3])) > 1.9


def test_two_spheres_stack():
    b = MultiBodyBuilder(is_floating=True, name="ball")
    b.set_base_inertia(1.0, (0, 0, 0), np.diag([0.1] * 3))
    ball = b.finalize()
    geom = (GeomAttachment(link_index=-1, shape=Sphere(0.5)),)
    plane_model, plane_geoms = make_ground_plane()
    world = build_world(
        [(plane_model, plane_geoms), (ball, geom), (ball, geom)],
        solver=ContactSolverParams(pgs_iterations=4),
    )
    q1 = ball.zero_q().at[6].set(0.55)
    q2 = ball.zero_q().at[6].set(1.65)
    qs = (jnp.zeros(0), q1, q2)
    qds = (jnp.zeros(0), ball.zero_qd(), ball.zero_qd())
    taus = (jnp.zeros(0),) * 3

    def step(carry, _):
        qs, qds = carry
        qs, qds = world_step(world, qs, qds, taus, GRAVITY, 1e-3)
        return (qs, qds), None

    (qs, qds), _ = jax.lax.scan(step, (qs, qds), None, length=2000)
    # stack: bottom at ~0.5, top at ~1.5
    assert abs(float(qs[1][6]) - 0.5) < 0.05
    assert abs(float(qs[2][6]) - 1.5) < 0.08


def test_batched_contact_sim():
    world, ball = _ball_world(radius=0.5)
    taus = (jnp.zeros(0), jnp.zeros(0))

    def rollout(z0):
        q = ball.zero_q().at[6].set(z0)
        qs = (jnp.zeros(0), q)
        qds = (jnp.zeros(0), ball.zero_qd())

        def step(carry, _):
            qs, qds = carry
            return world_step(world, qs, qds, taus, GRAVITY, 1e-3), None

        (qs, qds), _ = jax.lax.scan(step, (qs, qds), None, length=300)
        return qs[1][6]

    z0s = jnp.linspace(0.6, 2.0, 16)
    batched = jax.vmap(rollout)(z0s)
    singles = jnp.stack([rollout(z) for z in z0s])
    np.testing.assert_allclose(batched, singles, atol=1e-10)


def test_contact_gradients():
    """Gradient flows through the contact impulse (billiard-style)."""
    world, ball = _ball_world(radius=0.5, restitution=0.6)
    taus = (jnp.zeros(0), jnp.zeros(0))

    def final_height(z0):
        q = ball.zero_q().at[6].set(z0)
        qs = (jnp.zeros(0), q)
        qds = (jnp.zeros(0), ball.zero_qd())

        def step(carry, _):
            qs, qds = carry
            return world_step(world, qs, qds, taus, GRAVITY, 1e-3), None

        (qs, qds), _ = jax.lax.scan(step, (qs, qds), None, length=700)
        return qs[1][6]

    g = jax.grad(final_height)(1.2)
    assert np.isfinite(float(g))
    eps = 1e-5
    fd = (final_height(1.2 + eps) - final_height(1.2 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-2, atol=1e-3)


def test_friction_mode_world_default():
    import dataclasses
    """friction_mode="world_default" reproduces the reference's semantics
    (world.hpp:320-327): every pair uses the solver's world friction, not
    the geom materials."""
    import jax.numpy as jnp

    from tds_tpu.contact.mlcp import ContactSolverParams
    from tds_tpu.model.geometry import GeomAttachment, Sphere
    from tds_tpu.model.multibody import MultiBodyBuilder
    from tds_tpu.world import build_world, gather_pair_contacts, make_ground_plane
    from tds_tpu.dynamics.kinematics import fk_links

    b = MultiBodyBuilder(is_floating=True, name="ball")
    b.set_base_inertia(1.0, (0, 0, 0), np.diag([0.01] * 3))
    ball = b.finalize()
    geom = (GeomAttachment(link_index=-1, shape=Sphere(0.1), friction=0.9),)
    solver = ContactSolverParams(friction=0.5)

    for mode, expect in (("geom_min", 0.5), ("world_default", 0.5)):
        world = build_world(
            [make_ground_plane(), (ball, geom)], solver=solver,
            friction_mode=mode,
        )
        q = ball.zero_q().at[6].set(0.05)
        kins = [
            fk_links(world.bodies[i], q0, jnp.zeros(world.bodies[i].dof_qd))
            for i, q0 in enumerate((jnp.zeros(0), q))
        ]
        batch = gather_pair_contacts(world, kins, 0, 1, q.dtype)
        assert float(batch.friction[0]) == expect, mode

    # with a slippery plane geom, geom_min picks it up; world_default ignores
    plane_model, plane_geoms = make_ground_plane()
    slippery = (dataclasses.replace(plane_geoms[0], friction=0.1),)
    for mode, expect in (("geom_min", 0.1), ("world_default", 0.5)):
        world = build_world(
            [(plane_model, slippery), (ball, geom)], solver=solver,
            friction_mode=mode,
        )
        q = ball.zero_q().at[6].set(0.05)
        kins = [
            fk_links(plane_model, jnp.zeros(0), jnp.zeros(0)),
            fk_links(ball, q, jnp.zeros(ball.dof_qd)),
        ]
        batch = gather_pair_contacts(world, kins, 0, 1, q.dtype)
        assert float(batch.friction[0]) == expect, mode


def test_topk_compaction_matches_full_system():
    """ContactSolverParams.top_k (round 5): while <= k candidates
    penetrate, the compacted MLCP must reproduce the full system — same
    active rows, same PGS sweep order, so trajectories agree to float
    precision. Driven ant rollout (17 candidates -> 51 rows vs top_k=8 ->
    24 rows); measured divergence is pure reduction-order noise."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tds_tpu.contact.mlcp import ContactSolverParams
    from tds_tpu.envs.ant import AntEnv

    def rollout(env, n=100):
        st, _obs = env.reset(jax.random.PRNGKey(0))

        def step(carry, i):
            st = carry
            a = 0.3 * jnp.sin(0.05 * i * jnp.arange(env.action_dim))
            st, _o, _r, _d = env.step(st, a.astype(jnp.float32))
            return st, st.q

        _, qs = jax.lax.scan(step, st, jnp.arange(n))
        return np.asarray(qs)

    full = rollout(AntEnv(dtype=jnp.float32,
                          solver=ContactSolverParams(top_k=0)))
    top8 = rollout(AntEnv(dtype=jnp.float32))  # default top_k=8
    np.testing.assert_allclose(top8, full, atol=5e-5)
