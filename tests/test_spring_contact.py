"""Spring-damper (penalty) contact solver tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tds_tpu.contact.spring import (
    FrictionModel,
    SpringContactParams,
    compute_contact_force,
    compute_friction_force,
)
from tds_tpu.model.geometry import GeomAttachment, Sphere
from tds_tpu.model.multibody import MultiBodyBuilder
from tds_tpu.world import build_world, make_ground_plane, world_step

GRAVITY = jnp.array([0.0, 0.0, -9.81])


def test_normal_force_model():
    p = SpringContactParams(spring_k=1000.0, damper_d=10.0, exponent_n=1.0)
    # no penetration -> no force
    assert float(compute_contact_force(jnp.asarray(0.01), jnp.asarray(0.0), p)) == 0.0
    # penetration -> spring force k*p
    np.testing.assert_allclose(
        float(compute_contact_force(jnp.asarray(-0.01), jnp.asarray(0.0), p)),
        10.0,
        rtol=1e-9,
    )
    # approaching adds damping, separating does not
    f_app = compute_contact_force(jnp.asarray(-0.01), jnp.asarray(-1.0), p)
    f_sep = compute_contact_force(jnp.asarray(-0.01), jnp.asarray(1.0), p)
    assert float(f_app) > float(f_sep)
    np.testing.assert_allclose(float(f_sep), 10.0, rtol=1e-9)
    # continuous at p=0
    eps = 1e-9
    assert float(compute_contact_force(jnp.asarray(-eps), jnp.asarray(0.0), p)) < 1e-5


def test_friction_models():
    f_n = jnp.asarray(10.0)
    v_t = jnp.asarray([0.5, 0.0, 0.0])
    p_c = SpringContactParams(mu_kinetic=0.5, friction_model=FrictionModel.COULOMB)
    f = compute_friction_force(f_n, v_t, p_c)
    np.testing.assert_allclose(f, [-5.0, 0, 0], atol=1e-9)
    p_a = SpringContactParams(
        mu_static=0.8, mu_kinetic=0.5, friction_model=FrictionModel.ANDERSSON
    )
    fa = compute_friction_force(f_n, v_t, p_a)
    assert fa[0] < 0 and abs(fa[1]) < 1e-12
    # static regime: slow speed approaches mu_static-scaled force direction
    p_n = SpringContactParams(friction_model=FrictionModel.NONE)
    np.testing.assert_allclose(
        compute_friction_force(f_n, v_t, p_n), [0, 0, 0], atol=1e-12
    )


def _spring_world(spring):
    b = MultiBodyBuilder(is_floating=True, name="ball")
    b.set_base_inertia(1.0, (0, 0, 0), np.diag([0.1] * 3))
    ball = b.finalize()
    geom = (GeomAttachment(link_index=-1, shape=Sphere(0.5)),)
    plane_model, plane_geoms = make_ground_plane()
    world = build_world(
        [(plane_model, plane_geoms), (ball, geom)],
        contact_model="spring",
        spring=spring,
    )
    return world, ball


def test_ball_settles_with_spring_contact():
    world, ball = _spring_world(
        SpringContactParams(spring_k=5000.0, damper_d=100.0)
    )
    q = ball.zero_q().at[6].set(0.6)
    qs, qds = (jnp.zeros(0), q), (jnp.zeros(0), ball.zero_qd())
    taus = (jnp.zeros(0), jnp.zeros(0))

    def step(carry, _):
        qs, qds = carry
        return world_step(world, qs, qds, taus, GRAVITY, 1e-3), None

    (qs, qds), _ = jax.lax.scan(step, (qs, qds), None, length=3000)
    z = float(qs[1][6])
    # settles slightly below r (penalty penetration ~ mg/k = 0.002)
    assert 0.49 < z < 0.501
    assert abs(float(qds[1][5])) < 0.01


def test_spring_contact_gradient_smoothness():
    """Gradients through the spring solver are finite and match FD."""
    world, ball = _spring_world(
        SpringContactParams(spring_k=2000.0, damper_d=50.0)
    )
    taus = (jnp.zeros(0), jnp.zeros(0))

    def final_z(z0):
        q = ball.zero_q().at[6].set(z0)
        qs, qds = (jnp.zeros(0), q), (jnp.zeros(0), ball.zero_qd())

        def step(carry, _):
            qs, qds = carry
            return world_step(world, qs, qds, taus, GRAVITY, 1e-3), None

        (qs, qds), _ = jax.lax.scan(step, (qs, qds), None, length=400)
        return qs[1][6]

    g = jax.grad(final_z)(0.9)
    eps = 1e-5
    fd = (final_z(0.9 + eps) - final_z(0.9 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-3, atol=1e-5)
