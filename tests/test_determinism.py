"""Determinism + numerical-guard tests.

The reference's Fix64 fixed-point scalar exists for cross-platform
determinism; on TPU/XLA the analog guarantee is bitwise reproducibility of
the same compiled program on the same platform — asserted here (same seed
-> identical trajectories; identical across devices of the virtual mesh).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tds_tpu.envs.cartpole import CartpoleEnv
from tds_tpu.model.pendulum import compound_pendulum, spherical_pendulum
from tds_tpu.dynamics import forward_dynamics, integrate_euler

GRAVITY = jnp.array([0.0, 0.0, -9.81])


def test_same_seed_identical_trajectories():
    env = CartpoleEnv()

    def rollout(seed):
        state, obs = env.reset(jax.random.PRNGKey(seed))

        def body(carry, _):
            state = carry
            state, obs, r, d = env.step(state, jnp.zeros(1))
            return state, obs

        _, traj = jax.lax.scan(body, state, None, length=200)
        return traj

    t1 = rollout(42)
    t2 = rollout(42)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    t3 = rollout(43)
    assert not np.array_equal(np.asarray(t1), np.asarray(t3))


def test_identical_across_virtual_devices():
    """The same state stepped on each device of the mesh gives bitwise
    identical results (replacing the reference's determinism story)."""
    model = compound_pendulum(3)
    n_dev = len(jax.devices())
    q = jnp.tile(jnp.array([0.3, -0.2, 0.5]), (n_dev, 1))
    qd = jnp.zeros((n_dev, 3))

    from tds_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    qs = shard_batch(q, mesh)
    qds = shard_batch(qd, mesh)
    f = jax.jit(
        jax.vmap(lambda q, qd: forward_dynamics(model, q, qd, jnp.zeros(3), GRAVITY))
    )
    out = np.asarray(f(qs, qds))
    for k in range(1, n_dev):
        np.testing.assert_array_equal(out[k], out[0])


def test_spherical_pendulum_energy():
    model = spherical_pendulum(2, link_length=0.4)
    assert model.dof_q == 8 and model.dof_qd == 6
    q = model.zero_q()
    # tilt first joint
    from tds_tpu.algebra import quaternion

    tilt = quaternion.from_axis_angle(jnp.array([1.0, 0, 0]), jnp.asarray(0.7))
    q = q.at[0:4].set(tilt)
    qd = model.zero_qd()
    # disable the built-in spherical damping for the energy check
    model = model.replace(joint_damping=jnp.asarray(1.0))

    def step(carry, _):
        q, qd = carry
        qdd = forward_dynamics(model, q, qd, jnp.zeros(6), GRAVITY)
        return integrate_euler(model, q, qd, qdd, 1e-4), None

    (qf, qdf), _ = jax.lax.scan(step, (q, qd), None, length=2000)
    assert np.all(np.isfinite(np.asarray(qf)))
    # quaternions stay normalized
    np.testing.assert_allclose(np.linalg.norm(np.asarray(qf[0:4])), 1.0, atol=1e-9)


def test_nan_guards():
    from tds_tpu.utils.debug import assert_finite_tree, where_finite

    x = jnp.array([1.0, jnp.inf, jnp.nan])
    np.testing.assert_allclose(where_finite(x, -1.0), [1.0, -1.0, -1.0])
    with pytest.raises(FloatingPointError, match="non-finite"):
        assert_finite_tree({"a": x})
    assert_finite_tree({"a": jnp.ones(3)})  # clean passes


def test_system_constructor():
    from tds_tpu.urdf.system_constructor import system_constructor

    text = """
    <robot name="ball">
      <link name="base">
        <inertial><mass value="1"/><inertia ixx="0.1" iyy="0.1" izz="0.1"/></inertial>
        <collision><geometry><sphere radius="0.5"/></geometry></collision>
      </link>
    </robot>
    """
    model, world = system_constructor(
        urdf_string=text, is_floating=True, joint_damping=0.1
    )
    assert world.num_bodies == 2  # plane + ball
    from tds_tpu.world import world_step

    q = model.zero_q().at[6].set(1.0)
    qs, qds = (jnp.zeros(0), q), (jnp.zeros(0), model.zero_qd())
    qs, qds = world_step(world, qs, qds, (jnp.zeros(0), jnp.zeros(0)), GRAVITY, 1e-3)
    assert np.all(np.isfinite(np.asarray(qs[1])))
