"""Rigid body + sequential impulse solver + neural augmentation tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tds_tpu import rigid_body as rb
from tds_tpu.collision.narrowphase import plane_sphere
from tds_tpu.algebra.transform import Transform
from tds_tpu.model.geometry import Plane, Sphere


def test_projectile_motion():
    params = rb.RigidBodyParams.create(2.0, dtype=jnp.float64)
    state = rb.RigidBodyState.create(position=[0.0, 0, 0], dtype=jnp.float64)
    state = state.replace(linear_velocity=jnp.array([3.0, 0.0, 4.0]))
    g = jnp.array([0.0, 0.0, -10.0])
    dt = 1e-3
    for _ in range(100):
        state = rb.apply_gravity(state, params, g)
        state = rb.apply_force_impulse(state, params, dt)
        state = rb.clear_forces(state)
        state = rb.integrate(state, dt)
    t = 0.1
    np.testing.assert_allclose(float(state.position[0]), 3.0 * t, rtol=1e-9)
    # explicit euler z error is O(dt)
    np.testing.assert_allclose(
        float(state.position[2]), 4.0 * t - 0.5 * 10 * t * t, atol=1e-2
    )


def test_bouncing_rigid_sphere():
    params_ball = rb.RigidBodyParams.create(1.0, dtype=jnp.float64)
    params_ground = rb.RigidBodyParams.create(0.0, dtype=jnp.float64)
    ball = rb.RigidBodyState.create(position=[0, 0, 1.0], dtype=jnp.float64)
    ground = rb.RigidBodyState.create(dtype=jnp.float64)
    g = jnp.array([0.0, 0.0, -9.81])
    dt = 1e-3

    def step(carry, _):
        ball, ground = carry
        ball = rb.apply_gravity(ball, params_ball, g)
        ball = rb.apply_force_impulse(ball, params_ball, dt)
        ball = rb.clear_forces(ball)
        c = plane_sphere(
            Plane(), Transform.identity(jnp.float64), Sphere(0.5),
            Transform(pos=ball.position, rot=jnp.eye(3, dtype=jnp.float64)),
        )
        ground2, ball2 = rb.resolve_contact_sequential_impulse(
            ground, params_ground, ball, params_ball,
            c.normal_on_b[0], c.point_a[0], c.point_b[0], c.distance[0],
            dt, friction=0.5, restitution=0.7,
        )
        ball2 = rb.integrate(ball2, dt)
        return (ball2, ground2), ball2.position[2]

    (ball, ground), zs = jax.lax.scan(step, (ball, ground), None, length=1500)
    zs = np.asarray(zs)
    i_min = zs.argmin()
    assert zs[i_min] < 0.52
    assert zs[i_min:].max() > 0.6  # bounces back with restitution 0.7
    assert np.all(np.isfinite(zs))


def test_neural_augmentation_learns_gravity_residual():
    """An augmentation net learns to cancel an unmodeled constant torque."""
    from tds_tpu.model.pendulum import compound_pendulum
    from tds_tpu.dynamics import forward_dynamics
    from tds_tpu.utils.neural_augmentation import AugmentationSpec, Wiring

    model = compound_pendulum(1)
    g = jnp.array([0.0, 0.0, -9.81])
    spec = AugmentationSpec(l2=1e-6).add_wiring(
        Wiring("tau_residual", input_dim=2, output_dim=1, hidden=(8,))
    )
    true_bias = 0.7  # unmodeled constant torque

    def target_qdd(q, qd):
        return forward_dynamics(model, q, qd, jnp.array([true_bias]), g)

    def pred_qdd(params, q, qd):
        inputs = jnp.concatenate([q, qd], axis=-1)
        tau = spec.apply(params, "tau_residual", inputs, value=jnp.zeros(1))
        return forward_dynamics(model, q, qd, tau, g)

    rng = np.random.default_rng(0)
    qs = jnp.asarray(rng.uniform(-1, 1, size=(64, 1)))
    qds = jnp.asarray(rng.uniform(-1, 1, size=(64, 1)))
    targets = jax.vmap(target_qdd)(qs, qds)

    def loss(params):
        preds = jax.vmap(lambda q, qd: pred_qdd(params, q, qd))(qs, qds)
        return jnp.mean((preds - targets) ** 2) + spec.regularization(params)

    params = 0.01 * jnp.asarray(rng.normal(size=spec.num_parameters))
    lval = jax.jit(loss)
    lgrad = jax.jit(jax.grad(loss))
    for i in range(300):
        params = params - 0.05 * lgrad(params)
    assert float(lval(params)) < 1e-3
