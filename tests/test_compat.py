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

def test_round3_binding_surface():
    """Round-3 widening: contact-point classes, constraint-solver objects
    with reference parameter names, IK binding, actuators, scalar math
    (pytinydiffsim.inl:657-686,751-856)."""
    from tds_tpu import compat as pd

    # scalar-trait math
    assert pd.pi() == pytest.approx(np.pi)
    assert float(pd.max(1.0, 2.0)) == 2.0
    assert float(pd.min(1.0, 2.0)) == 1.0
    assert float(pd.clip(3.0, 0.0, 2.0)) == 2.0
    assert float(pd.where_gt(2.0, 1.0, 5.0, 6.0)) == 5.0
    assert float(pd.where_lt(2.0, 1.0, 5.0, 6.0)) == 6.0
    assert float(pd.where_eq(1.0, 1.0, 5.0, 6.0)) == 5.0
    assert float(pd.sqrt(4.0)) == 2.0
    assert float(pd.copy(jnp.asarray(2.0))) == 2.0

    # quaternion helpers
    qa = pd.quaternion_axis_angle([0.0, 0.0, 1.0], 0.5)
    qb = pd.quaternion_axis_angle([0.0, 0.0, 1.0], 0.7)
    dq = pd.quat_difference(qa, qb)
    ang = 2.0 * np.arccos(np.clip(float(dq[3]), -1, 1))
    assert ang == pytest.approx(0.2, abs=1e-6)
    m = pd.quat_to_matrix(qa)
    np.testing.assert_allclose(pd.matrix_to_euler_xyz(m), [0.0, 0.0, 0.5], atol=1e-7)
    qi = pd.quat_integrate(pd.Quaternion(), [0.0, 0.0, 1.0], 0.01)
    assert np.isfinite(np.asarray(qi)).all()

    # inertia dyad
    dyad = pd.compute_inertia_dyad(1.5, [0.0, 0.0, 0.1], 0.02 * np.eye(3))
    assert float(dyad.mass) == pytest.approx(1.5)

    # find_file resolves a bundled asset
    path = pd.find_file("laikago/laikago_toes_zup.urdf")
    assert path

    # multibody free functions round trip
    from tds_tpu.model.pendulum import compound_pendulum

    mb = pd.TinyMultiBody(compound_pendulum(2))
    mb.set_q(jnp.array([0.4, -0.1]))
    base_x, links_x = pd.forward_kinematics(mb)
    x_in_base = pd.link_transform_base_frame(mb, 1)
    assert np.isfinite(np.asarray(x_in_base.pos)).all()
    mb.qdd = jnp.array([1.0, -1.0])
    qd0 = mb.qd
    pd.integrate_euler_qdd(mb, 0.01)
    np.testing.assert_allclose(mb.qd - qd0, [0.01, -0.01], atol=1e-12)

    # IK binding: reach for a point near the tip's current position
    from tds_tpu.dynamics.kinematics import forward_kinematics_q

    _, lx, _ = forward_kinematics_q(mb.model, mb.q)
    target = np.asarray(lx[1].pos) + [0.01, 0.0, 0.01]
    q_target = pd.inverse_kinematics_compat(mb, 1, target)
    assert q_target.shape == mb.q.shape
    _, lx2, _ = forward_kinematics_q(mb.model, jnp.asarray(q_target))
    d_new = np.linalg.norm(np.asarray(lx2[1].pos) - target)
    d_old = np.linalg.norm(np.asarray(lx[1].pos) - target)
    assert d_new < d_old

    # actuators
    act = pd.TinyActuator(2)
    act.gear_ratios = jnp.asarray([2.0, 2.0])
    act.limits = jnp.asarray([0.4, 0.4])
    np.testing.assert_allclose(act.compute_torques([1.0, 0.2]), [0.4, 0.1])
    servo = pd.TinyServoActuator(2, kp=10.0, kd=1.0)
    tau = servo.compute_torques([0.0, 0.0], [0.0, 0.0], [0.1, -0.1])
    np.testing.assert_allclose(tau, [1.0, -1.0], atol=1e-12)


def test_round3_contact_solver_bindings():
    """TinyContactPoint* + solver objects resolve a penetrating contact."""
    from tds_tpu import compat as pd

    # rigid-body pair: sphere resting into a heavy static "floor" body
    a = pd.TinyRigidBody(1.0, position=(0.0, 0.0, 0.45))
    a.state = a.state.replace(linear_velocity=jnp.asarray([0.0, 0.0, -1.0]))
    b = pd.TinyRigidBody(1e12, position=(0.0, 0.0, 0.0))
    cp = pd.TinyContactPointRigidBody()
    cp.rigid_body_a, cp.rigid_body_b = a, b
    cp.world_normal_on_b = jnp.asarray([0.0, 0.0, 1.0])
    cp.world_point_on_a = jnp.asarray([0.0, 0.0, -0.05])
    cp.world_point_on_b = jnp.asarray([0.0, 0.0, 0.0])
    cp.distance = -0.05
    solver = pd.TinyConstraintSolver()
    solver.resolve_collision(cp, 0.01)
    assert float(a.state.linear_velocity[2]) > -1e-6  # approach cancelled

    # multibody vs static plane through the MLCP solver object
    text = """
    <robot name="ball">
      <link name="base">
        <inertial><mass value="1"/><inertia ixx="0.1" iyy="0.1" izz="0.1"/></inertial>
        <collision><geometry><sphere radius="0.5"/></geometry></collision>
      </link>
    </robot>
    """
    mb = pd.UrdfParser.load_urdf_from_string(text, is_floating=True)
    mb.set_q(mb.q.at[6].set(0.45))
    mb.set_qd(mb.qd.at[5].set(-1.0))  # falling
    plane = pd.UrdfParser.load_urdf_from_string(
        """
        <robot name="plane"><link name="base">
        <collision><geometry><plane normal="0 0 1"/></geometry></collision>
        </link></robot>
        """
    )
    mcp = pd.TinyContactPointMultiBody()
    mcp.multi_body_a, mcp.multi_body_b = mb, plane
    mcp.world_normal_on_b = jnp.asarray([0.0, 0.0, 1.0])
    mcp.world_point_on_a = jnp.asarray([0.0, 0.0, -0.05])
    mcp.world_point_on_b = jnp.asarray([0.0, 0.0, 0.0])
    mcp.distance = -0.05
    mcp.link_a, mcp.link_b = -1, -1  # base-attached geometry on both
    msolver = pd.TinyMultiBodyConstraintSolver()
    msolver.pgs_iterations_ = 30
    msolver.resolve_collision([mcp], 0.01)
    assert float(mb.qd[5]) > -1e-6  # normal velocity resolved

    # spring solver object: force laws behave sanely
    ssolver = pd.TinyMultiBodyConstraintSolverSpring()
    fn = ssolver.compute_contact_force(-0.01, -0.1)
    assert float(fn) > 0.0
    ft = ssolver.compute_friction_force(jnp.asarray(10.0), jnp.asarray([0.2, 0.0]))
    assert np.isfinite(np.asarray(ft)).all()


def test_round3_inl_surface_completion():
    """The final .inl name sweep: matrix constructors, enums with
    export_values, TinyPose/TinyLink, TinyRaycast volume fitting, env
    simulation records and stateful EnvOutput adapters
    (pytinydiffsim.inl:450-561,719-741,827-891,940-1185)."""
    from tds_tpu import compat as pd

    # matrix constructors
    np.testing.assert_allclose(pd.Matrix3(), np.eye(3))
    assert pd.Matrix(2, 5).shape == (2, 5)
    assert pd.Matrix3X(4).shape == (3, 4)
    assert pd.Matrix6x3().shape == (6, 3)
    assert pd.TinyMatrix3x3 is pd.Matrix3
    assert pd.TinyVectorX([1.0, 2.0]).shape == (2,)

    # enums + export_values parity (module-scope members)
    assert pd.TinyJointType.JOINT_SPHERICAL == 8
    assert pd.JOINT_FIXED == -1
    assert pd.TinyGeometryTypes.SPHERE_TYPE == 0
    assert pd.NN_ACT_IDENTITY == -1
    assert pd.NN_INIT_XAVIER == 0
    assert pd.SMOOTH_VEL_TANH == 2

    # TinyPose round trip
    pose = pd.TinyPose(
        [1.0, 0.0, 0.0], pd.quaternion_axis_angle([0, 0, 1], np.pi / 2)
    )
    p = pose.transform([1.0, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(p), [1.0, 1.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(pose.inverse_transform(p)), [1.0, 0.0, 0.0], atol=1e-12
    )

    # TinyLink jcalc: revolute-z quarter turn moves a unit-x offset to +y
    from tds_tpu.algebra.transform import Transform

    rbi = pd.compute_inertia_dyad(1.0, jnp.zeros(3), jnp.eye(3))
    link = pd.TinyLink(pd.JOINT_REVOLUTE_Z, Transform.identity(), rbi)
    xw = link.jcalc(np.pi / 2)
    np.testing.assert_allclose(
        np.asarray(xw.rot @ jnp.asarray([1.0, 0.0, 0.0])),
        [0.0, 1.0, 0.0],
        atol=1e-12,
    )

    # ArticulatedBodyInertia exposed with I/H/M fields
    abi = pd.ArticulatedBodyInertia.from_rbi(rbi)
    assert abi.I.shape == (3, 3) and abi.H.shape == (3, 3) and abi.M.shape == (3, 3)

    # TinyRaycast: unit-diameter sphere through a 1-long ray -> chord length;
    # volume of the union and the self-intersection agree
    col = pd.TinyUrdfCollision()
    col.origin_xyz = (0.0, 0.0, 0.0)
    col.geometry = pd.TinyUrdfGeometry(geom_type="sphere", radius=0.25)
    rc = pd.TinyRaycast()
    hits = rc.cast_rays([[0.0, 0.0, 1.0]], [[0.0, 0.0, -1.0]], [col])
    assert len(hits[0]) == 2  # entry + exit
    assert hits[0][0].hit_fraction == pytest.approx(0.375)
    assert hits[0][1].hit_fraction == pytest.approx(0.625)
    assert rc.volume(hits) == pytest.approx(0.25)
    assert rc.intersection_volume(hits, hits) == pytest.approx(0.25)

    # box collider: axis-aligned unit box centered at origin
    bcol = pd.TinyUrdfCollision()
    bcol.geometry = pd.TinyUrdfGeometry(geom_type="box", extents=(1.0, 1.0, 1.0))
    bhits = rc.cast_rays([[0.0, 0.0, 1.0]], [[0.0, 0.0, -1.0]], [bcol])
    assert rc.volume(bhits) == pytest.approx(0.5)
    # sphere-in-box intersection along the same ray = the sphere chord
    assert rc.intersection_volume(hits, bhits) == pytest.approx(0.25)

    # misc free functions
    assert pd.get_debug_double(jnp.asarray(2.5)) == 2.5

    # simulation records resolve bundled URDFs
    assert pd.CartpoleSimulation().m_urdf_filename.endswith("cartpole.urdf")
    assert pd.AntContactSimulation().m_urdf_filename.endswith(
        "ant_org_xyz_xyzrot.urdf"
    )
    assert pd.ReacherSimulation().m_urdf_filename.endswith("reacher.urdf")


def test_round3_stateful_env_adapters():
    """CartpoleEnv/ReacherEnv now expose the .inl stateful API (reset() ->
    obs, step(a) -> EnvOutput, rollout -> RolloutOutput, policy) while the
    functional reset(key)/step(state, action) passthrough keeps working."""
    from tds_tpu import compat as pd

    env = pd.CartpoleEnv()
    env.seed(3)
    obs = env.reset()
    assert obs.shape == (env.observation_dim,)
    out = env.step(jnp.zeros(env.action_dim))
    assert isinstance(out, pd.CartpoleEnvOutput)
    assert np.isfinite(out.reward)
    env.init_neural_network(jnp.zeros(env._policy.num_parameters))
    act = env.policy(obs)
    assert act.shape == (env.action_dim,)
    ro = env.rollout(max_steps=20)
    assert isinstance(ro, pd.CartpoleRolloutOutput)
    assert ro.num_steps <= 20 and np.isfinite(ro.total_reward)

    # functional passthrough arity
    state, obs2 = env.reset(jax.random.PRNGKey(0))
    state, obs2, r, d = env.step(state, jnp.zeros(env.action_dim))
    assert np.isfinite(float(r))

    # vectorized stateful adapter with visual transforms for rendering
    venv = pd.VectorizedAntEnv(num_envs=2)
    assert venv.action_dim() == venv.env.action_dim
    assert venv.obs_dim() == venv.env.observation_dim
    assert venv.urdf_filename().endswith(".urdf")
    vobs = venv.reset()
    assert vobs.shape == (2, venv.env.observation_dim)
    vout = venv.step(jnp.zeros((2, venv.env.action_dim)))
    assert isinstance(vout, pd.VectorizedAntEnvOutput)
    assert vout.rewards.shape == (2,)
    n_links = len(venv.env.model.joint_types)
    assert vout.visual_world_transforms.shape == (2, 1 + n_links, 7)
