"""Unit tests for the spatial algebra layer.

Ports the assertions of the reference's test_spatial.cpp:491-560: transforms
vs their 6x6 matrix form, quaternion round-trips, transform inverse,
spatial cross products, and inertia construction/transformation identities.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tds_tpu.algebra import quaternion as quat
from tds_tpu.algebra import rotation, spatial
from tds_tpu.algebra.inertia import ArticulatedBodyInertia, RigidBodyInertia
from tds_tpu.algebra.transform import Transform

RNG = np.random.default_rng(42)


def random_transform():
    q = RNG.normal(size=4)
    q = q / np.linalg.norm(q)
    return Transform(
        pos=jnp.asarray(RNG.normal(size=3)),
        rot=quat.to_matrix(jnp.asarray(q)),
    )


def random_quat():
    q = RNG.normal(size=4)
    return jnp.asarray(q / np.linalg.norm(q))


def test_quaternion_matrix_roundtrip():
    for _ in range(20):
        q = random_quat()
        m = quat.to_matrix(q)
        # valid rotation
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-12)
        q2 = quat.from_matrix(m)
        # q and -q are the same rotation
        sign = jnp.sign(jnp.sum(q * q2))
        np.testing.assert_allclose(q2 * sign, q, atol=1e-9)


def test_quaternion_mul_matches_matrix_product():
    for _ in range(10):
        a, b = random_quat(), random_quat()
        np.testing.assert_allclose(
            quat.to_matrix(quat.mul(a, b)),
            quat.to_matrix(a) @ quat.to_matrix(b),
            atol=1e-12,
        )


def test_quaternion_rotate_matches_matrix():
    for _ in range(10):
        q = random_quat()
        v = jnp.asarray(RNG.normal(size=3))
        np.testing.assert_allclose(
            quat.rotate(q, v), quat.to_matrix(q) @ v, atol=1e-12
        )


def test_axis_angle_roundtrip():
    axis = jnp.asarray([0.0, 0.6, 0.8])
    angle = jnp.asarray(0.7)
    q = quat.from_axis_angle(axis, angle)
    np.testing.assert_allclose(quat.to_axis_angle(q), axis * angle, atol=1e-12)
    np.testing.assert_allclose(
        rotation.from_axis_angle(axis, angle), quat.to_matrix(q), atol=1e-12
    )


def test_elementary_rotations():
    a = 0.3
    np.testing.assert_allclose(
        rotation.rotation_x(jnp.asarray(a)) @ jnp.array([0.0, 1.0, 0.0]),
        [0.0, np.cos(a), np.sin(a)],
        atol=1e-15,
    )
    np.testing.assert_allclose(
        rotation.rotation_z(jnp.asarray(a)) @ jnp.array([1.0, 0.0, 0.0]),
        [np.cos(a), np.sin(a), 0.0],
        atol=1e-15,
    )


def test_transform_compose_matches_point_chain():
    x1, x2 = random_transform(), random_transform()
    p = jnp.asarray(RNG.normal(size=3))
    np.testing.assert_allclose(
        x1.compose(x2).apply_point(p),
        x1.apply_point(x2.apply_point(p)),
        atol=1e-12,
    )


def test_transform_inverse():
    x = random_transform()
    p = jnp.asarray(RNG.normal(size=3))
    np.testing.assert_allclose(
        x.inverse().apply_point(x.apply_point(p)), p, atol=1e-12
    )
    np.testing.assert_allclose(x.apply_inverse_point(x.apply_point(p)), p, atol=1e-12)


def test_motion_transform_matches_matrix():
    """Transform::apply(mv) must equal X.matrix() @ mv (test_spatial.cpp)."""
    x = random_transform()
    m = jnp.asarray(RNG.normal(size=6))
    np.testing.assert_allclose(
        x.motion_to_child(m), x.matrix() @ m, atol=1e-12
    )


def test_motion_roundtrip():
    x = random_transform()
    m = jnp.asarray(RNG.normal(size=6))
    np.testing.assert_allclose(x.motion_to_parent(x.motion_to_child(m)), m, atol=1e-12)


def test_force_transform_matches_matrix_transpose():
    """force_to_parent(f) == X.matrix()^T @ f (dual pairing preservation)."""
    x = random_transform()
    f = jnp.asarray(RNG.normal(size=6))
    np.testing.assert_allclose(
        x.force_to_parent(f), x.matrix().T @ f, atol=1e-12
    )
    np.testing.assert_allclose(x.force_to_child(x.force_to_parent(f)), f, atol=1e-12)


def test_pairing_invariance():
    """m . f is invariant when both are moved to the same frame."""
    x = random_transform()
    m = jnp.asarray(RNG.normal(size=6))
    f = jnp.asarray(RNG.normal(size=6))
    np.testing.assert_allclose(
        spatial.dot(m, x.force_to_parent(f)),
        spatial.dot(x.motion_to_child(m), f),
        atol=1e-12,
    )


def test_spatial_cross_products():
    v = jnp.asarray(RNG.normal(size=6))
    u = jnp.asarray(RNG.normal(size=6))
    f = jnp.asarray(RNG.normal(size=6))
    # crm(v) u = -crm(u) v
    np.testing.assert_allclose(
        spatial.cross_mm(v, u), -spatial.cross_mm(u, v), atol=1e-12
    )
    # duality: (v x m) . f = -m . (v x* f)
    np.testing.assert_allclose(
        spatial.dot(spatial.cross_mm(v, u), f),
        -spatial.dot(u, spatial.cross_mf(v, f)),
        atol=1e-12,
    )


def test_abi_from_rbi_matches_matrix():
    rbi = RigidBodyInertia.from_mass_com_inertia(
        2.5, jnp.asarray([0.1, -0.2, 0.3]), jnp.diag(jnp.asarray([0.4, 0.5, 0.6]))
    )
    abi = ArticulatedBodyInertia.from_rbi(rbi)
    v = jnp.asarray(RNG.normal(size=6))
    np.testing.assert_allclose(abi.mul_motion(v), abi.matrix() @ v, atol=1e-12)
    np.testing.assert_allclose(abi.mul_motion(v), rbi.mul_motion(v), atol=1e-12)
    # kinetic energy positive
    assert spatial.dot(v, abi.mul_motion(v)) > 0


def test_abi_inverse():
    rbi = RigidBodyInertia.from_mass_com_inertia(
        1.5, jnp.asarray([0.05, 0.1, -0.07]), jnp.diag(jnp.asarray([0.2, 0.3, 0.25]))
    )
    abi = ArticulatedBodyInertia.from_rbi(rbi)
    f = jnp.asarray(RNG.normal(size=6))
    a = abi.inv_mul(f)
    np.testing.assert_allclose(abi.mul_motion(a), f, atol=1e-10)


def test_abi_transform_matches_sandwich():
    """abi_to_parent must equal the explicit X^T I^A X product used by the
    reference (forward_dynamics.hpp:187-189)."""
    rbi = RigidBodyInertia.from_mass_com_inertia(
        1.2, jnp.asarray([0.1, 0.2, 0.3]), jnp.diag(jnp.asarray([0.3, 0.4, 0.5]))
    )
    abi = ArticulatedBodyInertia.from_rbi(rbi)
    x = random_transform()
    out = x.abi_to_parent(abi)
    xm = x.matrix()
    np.testing.assert_allclose(out.matrix(), xm.T @ abi.matrix() @ xm, atol=1e-12)


def test_rbi_transform_consistency():
    """Moving an RBI to the parent frame preserves f = I v physics:
    I_parent (X^-1-motion v) == X-force (I_child v)."""
    rbi = RigidBodyInertia.from_mass_com_inertia(
        1.7, jnp.asarray([0.02, -0.04, 0.06]), jnp.diag(jnp.asarray([0.1, 0.12, 0.14]))
    )
    x = random_transform()
    v_child = jnp.asarray(RNG.normal(size=6))
    rbi_parent = x.rbi_to_parent(rbi)
    lhs = rbi_parent.mul_motion(x.motion_to_parent(v_child))
    rhs = x.force_to_parent(rbi.mul_motion(v_child))
    np.testing.assert_allclose(lhs, rhs, atol=1e-10)


def test_quat_integration_matches_rotation_composition():
    """Integrating a constant world-frame angular velocity for many small
    steps approaches the exact rotation."""
    import jax

    w = jnp.asarray([0.3, -0.2, 0.5])
    dt = 1e-4
    n = 10000
    q, _ = jax.lax.scan(
        lambda qc, _: (quat.integrate_world(qc, w, dt), None),
        quat.identity(),
        None,
        length=n,
    )
    angle = float(jnp.linalg.norm(w)) * dt * n
    axis = w / jnp.linalg.norm(w)
    q_exact = quat.from_axis_angle(axis, jnp.asarray(angle))
    sign = jnp.sign(jnp.sum(q * q_exact))
    np.testing.assert_allclose(q * sign, q_exact, atol=1e-4)
