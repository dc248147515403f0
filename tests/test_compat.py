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
