"""pytinydiffsim-style compat layer: the billiard-optimization usage pattern."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tds_tpu import compat


def test_world_mb_step_loop():
    """The classic reference loop: load URDF, forward_dynamics, world.step,
    integrate_euler (pytinydiffsim examples)."""
    text = """
    <robot name="ball">
      <link name="base">
        <inertial><mass value="1"/><inertia ixx="0.1" iyy="0.1" izz="0.1"/></inertial>
        <collision><geometry><sphere radius="0.5"/></geometry></collision>
      </link>
    </robot>
    """
    mb = compat.UrdfParser.load_urdf_from_string(text, is_floating=True)
    world = compat.TinyWorld()
    world.bodies.append(mb)
    mb.set_q(mb.q.at[6].set(1.0))
    for _ in range(700):
        compat.forward_dynamics(mb, world.gravity)
        mb.qd = mb.qd + mb.qdd * 1e-3
        mb.qdd = jnp.zeros_like(mb.qdd)
        world.step(1e-3)
        from tds_tpu.dynamics.integrator import integrate_q

        mb.q, mb.qd = integrate_q(mb.model, mb.q, mb.qd, 1e-3)
    # ball fell and rests on the plane
    assert 0.45 < float(mb.q[6]) < 0.55
    assert abs(float(mb.qd[5])) < 0.1


def test_free_functions_and_math():
    v = compat.Vector3(1.0, 2.0, 3.0)
    np.testing.assert_allclose(v, [1, 2, 3])
    q = compat.Quaternion()
    np.testing.assert_allclose(compat.quat_to_matrix(q), np.eye(3), atol=1e-12)

    from tds_tpu.model.pendulum import compound_pendulum

    mb = compat.TinyMultiBody(compound_pendulum(2))
    mb.set_q(jnp.array([0.3, -0.2]))
    qdd = compat.forward_dynamics(mb, [0.0, 0.0, -9.81])
    assert qdd.shape == (2,)
    m = compat.mass_matrix(mb)
    assert m.shape == (2, 2)
    tau = compat.inverse_dynamics(mb, qdd, [0.0, 0.0, -9.81])
    np.testing.assert_allclose(tau, np.zeros(2), atol=1e-10)
    jac = compat.point_jacobian(mb, 1, [0.0, 0.0, -1.0])
    assert jac.shape == (3, 2)


def test_extended_binding_surface():
    """Round-2 widening of the pytinydiffsim veneer: geometry, rigid body,
    neural network, raycast, quaternion helpers, vectorized envs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tds_tpu import compat as pd

    # math helpers
    rpy = jnp.asarray([0.1, -0.2, 0.3])
    q = pd.quat_from_euler_rpy(rpy)
    np.testing.assert_allclose(pd.get_euler_rpy(q), rpy, atol=1e-6)
    v = pd.VectorX([1.0, 2.0, 3.0])
    assert v.shape == (3,)

    # geometry aliases
    s = pd.TinySphere(0.2)
    assert s.radius == 0.2
    assert pd.TinyPlane().normal == (0.0, 0.0, 1.0)

    # rigid body
    rb = pd.TinyRigidBody(2.0, position=(0.0, 0.0, 1.0))
    rb.apply_gravity((0, 0, -9.81))
    rb.apply_force_impulse(0.1)
    rb.clear_forces()
    rb.integrate(0.1)
    pos, orn = rb.world_pose
    assert float(pos[2]) < 1.0  # fell
    assert np.all(np.isfinite(np.asarray(pos)))

    # neural network
    nn = pd.TinyNeuralNetwork(3, (8, 2))
    nn.initialize(jax.random.PRNGKey(0))
    out = nn.compute(jnp.ones(3))
    assert out.shape == (2,) and np.all(np.isfinite(np.asarray(out)))

    # raycast
    from tds_tpu.algebra.transform import Transform

    hit = pd.cast_rays(
        jnp.asarray([[0.0, 0.0, 1.0]]),
        jnp.asarray([[0.0, 0.0, -1.0]]),
        [pd.TinySphere(0.25)],
        [Transform(pos=jnp.zeros(3), rot=jnp.eye(3))],
    )
    assert float(hit.fraction[0]) < 1.0  # hit the sphere

    # vectorized env (small batch to keep it quick)
    venv = pd.VectorizedAntEnv(num_envs=2)
    states, obs = venv.reset(jax.random.PRNGKey(0))
    states, obs, r, d = venv.step(
        states, jnp.zeros((2, venv.env.action_dim))
    )
    assert obs.shape[0] == 2
    assert np.all(np.isfinite(np.asarray(obs)))

    assert pd.fraction(1, 2) == 0.5
