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


def test_spring_solver_matches_discrete_oracle():
    """Pin the spring-damper constants end-to-end (round-2 weak #8: the
    solver had only qualitative tests because the reference ships its
    spring solver disabled). A falling, sideways-sliding sphere on a plane
    reduces to 2 scalar ODEs; a numpy replica of the exact discrete update
    (env-loop ordering: gravity kick -> f = k*pen + d*max(-vn,0) while
    penetrating -> velocity kick dt*f/m -> position update) must match the
    full pipeline (narrowphase -> Jacobians -> M^-1 -> integration)
    step-for-step, and the settled state must satisfy the analytic static
    equilibrium k*pen = m*g."""
    import numpy as np

    from tds_tpu.contact.spring import SpringContactParams
    from tds_tpu.model.geometry import GeomAttachment, Sphere
    from tds_tpu.model.multibody import MultiBodyBuilder
    from tds_tpu.world import build_world, make_ground_plane, world_step

    m, r = 1.5, 0.2
    k, d, mu = 4000.0, 60.0, 0.4
    dt, g = 1e-3, -9.81
    params = SpringContactParams(
        spring_k=k, damper_d=d, mu_kinetic=mu, mu_static=mu
    )

    b = MultiBodyBuilder(is_floating=True, name="oracle_sphere")
    b.set_base_inertia(m, (0, 0, 0), np.diag([0.024] * 3))
    ball = b.finalize()
    geom = (GeomAttachment(link_index=-1, shape=Sphere(r)),)
    world = build_world(
        [make_ground_plane(), (ball, geom)],
        contact_model="spring", spring=params,
    )

    q = ball.zero_q().at[6].set(0.25).at[4].set(0.0)
    qd = ball.zero_qd().at[5].set(-0.5).at[3].set(0.8)  # falling + sliding
    qs, qds = (jnp.zeros(0), q), (jnp.zeros(0), qd)
    taus = (jnp.zeros(0), jnp.zeros(0))
    gravity = jnp.array([0.0, 0.0, g])

    # numpy oracle for (x, z, vx, vz, wy): friction acts at the contact
    # point (lever arm -r z), so it also spins the ball; the tangential
    # slip velocity is vx - r*wy, not vx
    Iy = 0.024
    z, vz = 0.25, -0.5
    x, vx, wy = 0.0, 0.8, 0.0
    zs, xs = [], []
    n_steps = 800
    for _ in range(n_steps):
        vz += g * dt
        pen = max(-(z - r), 0.0)
        in_contact = (z - r) < 0.0
        f_n = (k * pen + d * max(-vz, 0.0)) if in_contact else 0.0
        vpx = vx - r * wy  # slip velocity of the contact point
        f_t = -mu * f_n * np.sign(vpx) if abs(vpx) > 1e-9 else 0.0
        vz += dt * f_n / m
        vx += dt * f_t / m
        wy += dt * (-r * f_t) / Iy  # torque = (-r z) x (f_t x) = -r f_t y
        z += dt * vz
        x += dt * vx
        zs.append(z)
        xs.append(x)

    traj_z, traj_x = [], []
    for _ in range(n_steps):
        qs, qds = world_step(world, qs, qds, taus, gravity, dt)
        traj_z.append(float(qs[1][6]))
        traj_x.append(float(qs[1][4]))

    np.testing.assert_allclose(traj_z, zs, rtol=0, atol=1e-9,
                               err_msg="normal spring-damper law diverges")
    np.testing.assert_allclose(traj_x, xs, rtol=0, atol=1e-9,
                               err_msg="Coulomb friction law diverges")

    # analytic static equilibrium: k * penetration == m * g
    pen_final = r - traj_z[-1]
    assert abs(k * pen_final - m * abs(g)) < 0.05 * m * abs(g), (
        f"settled penetration {pen_final:.5f} != mg/k {m*abs(g)/k:.5f}"
    )
