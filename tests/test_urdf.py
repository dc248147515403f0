"""URDF parsing + conversion tests.

Uses the reference checkout's data assets read-only (when mounted) plus
self-authored URDF strings covering axis snapping, fixed joints, spherical
joints, materials, and error paths.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tds_tpu.dynamics import forward_dynamics
from tds_tpu.model.geometry import Box, Capsule, Plane, Sphere
from tds_tpu.model.joints import JointType
from tds_tpu.model.multibody import MultiBodyBuilder
from tds_tpu.urdf.cache import construct, construct_from_string
from tds_tpu.urdf.parser import UrdfError, parse_urdf_string

REF_DATA = "/root/reference/data"
GRAVITY = jnp.array([0.0, 0.0, -9.81])

CARTPOLE_URDF = """
<robot name="mini_cartpole">
  <link name="world"/>
  <link name="cart">
    <inertial><mass value="1.0"/><inertia ixx="0.01" iyy="0.01" izz="0.01"/></inertial>
    <collision><geometry><box size="0.2 0.1 0.1"/></geometry></collision>
  </link>
  <link name="pole">
    <inertial>
      <origin xyz="0 0 0.3"/>
      <mass value="0.3"/>
      <inertia ixx="0.005" iyy="0.005" izz="0.0005"/>
    </inertial>
    <collision><origin xyz="0 0 0.6"/><geometry><sphere radius="0.05"/></geometry></collision>
  </link>
  <joint name="slider" type="prismatic">
    <parent link="world"/><child link="cart"/>
    <axis xyz="0 1 0"/>
  </joint>
  <joint name="hinge" type="continuous">
    <parent link="cart"/><child link="pole"/>
    <origin xyz="0 0 0.05"/>
    <axis xyz="1 0 0"/>
  </joint>
</robot>
"""


def test_parse_mini_cartpole():
    s = parse_urdf_string(CARTPOLE_URDF)
    assert s.robot_name == "mini_cartpole"
    assert s.base_links[0].link_name == "world"
    assert [j.joint_name for j in s.joints] == ["slider", "hinge"]
    assert s.links[0].link_name == "cart"
    assert s.links[1].parent_index == 0

    model, geoms = construct_from_string(CARTPOLE_URDF)
    assert model.dof_q == 2 and model.dof_qd == 2
    # axis snapping: prismatic y, revolute x
    assert model.joint_types[0] == JointType.PRISMATIC_Y
    assert model.joint_types[1] == JointType.REVOLUTE_X
    assert isinstance(geoms[0].shape, Box)
    assert isinstance(geoms[1].shape, Sphere)
    assert geoms[1].link_index == 1

    # quick dynamics sanity: pole falls when displaced
    q = jnp.array([0.0, 0.1])
    qdd = forward_dynamics(model, q, jnp.zeros(2), jnp.zeros(2), GRAVITY)
    assert np.all(np.isfinite(np.asarray(qdd)))
    assert float(qdd[1]) > 0  # inverted pole tips further


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data not mounted")
def test_pendulum5_matches_programmatic_model():
    model, _ = construct("pendulum5.urdf")
    assert model.dof_q == 5
    assert all(t == JointType.REVOLUTE_X for t in model.joint_types)

    b = MultiBodyBuilder(name="pendulum5_manual")
    masses = [1.0, 2.16, 2.16, 2.16, 2.16]
    inertias = [
        np.diag([0.00494875, 0.00494174, 0.002219]),
        np.diag([0.00539427, 0.0048979, 0.00311573]),
        np.diag([0.00539427, 0.0048979, 0.00311573]),
        np.diag([0.00539427, 0.0048979, 0.00311573]),
        np.diag([0.00539427, 0.0048979, 0.00311573]),
    ]
    for i in range(5):
        b.add_link(
            JointType.REVOLUTE_X,
            parent=i - 1,
            x_t_pos=(0, 0, 0) if i == 0 else (0, 0.5, 0),
            mass=masses[i],
            com=(0, 0.5, 0),
            inertia_about_com=inertias[i],
        )
    manual = b.finalize()

    rng = np.random.default_rng(0)
    for _ in range(3):
        q = jnp.asarray(rng.normal(size=5))
        qd = jnp.asarray(rng.normal(size=5))
        tau = jnp.asarray(rng.normal(size=5))
        np.testing.assert_allclose(
            forward_dynamics(model, q, qd, tau, GRAVITY),
            forward_dynamics(manual, q, qd, tau, GRAVITY),
            rtol=1e-12,
            atol=1e-12,
        )


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data not mounted")
@pytest.mark.parametrize(
    "name,floating",
    [
        ("cartpole.urdf", False),
        ("laikago/laikago_toes_zup.urdf", True),
        ("humanoid.urdf", True),
        ("gym/ant_org_xyz_xyzrot.urdf", False),
        ("hopper_link0_1.urdf", False),
        ("cheetah_link0_1.urdf", False),
        ("swimmer/swimmer05/swimmer05.urdf", False),
        ("franka_panda/panda.urdf", False),
    ],
)
def test_reference_assets_load_and_simulate(name, floating):
    try:
        model, geoms = construct(name, is_floating=floating)
    except FileNotFoundError:
        pytest.skip(f"{name} not in reference data")
    assert model.num_links >= 1
    q = model.zero_q()
    qd = model.zero_qd()
    tau = jnp.zeros(model.dof_actuated)
    qdd = forward_dynamics(model, q, qd, tau, GRAVITY)
    assert np.all(np.isfinite(np.asarray(qdd))), name


def test_spherical_urdf():
    text = """
    <robot name="sph">
      <link name="base"><inertial><mass value="1"/><inertia ixx="0.1" iyy="0.1" izz="0.1"/></inertial></link>
      <link name="arm">
        <inertial><origin xyz="0 0 -0.2"/><mass value="0.5"/>
        <inertia ixx="0.01" iyy="0.01" izz="0.002"/></inertial>
      </link>
      <joint name="shoulder" type="spherical">
        <parent link="base"/><child link="arm"/>
        <origin xyz="0 0 -0.1"/>
      </joint>
    </robot>
    """
    model, _ = construct_from_string(text)
    assert model.joint_types[0] == JointType.SPHERICAL
    assert model.dof_q == 4 and model.dof_qd == 3
    q = model.zero_q()
    np.testing.assert_allclose(q, [0, 0, 0, 1])
    qdd = forward_dynamics(model, q, model.zero_qd(), jnp.zeros(3), GRAVITY)
    assert np.all(np.isfinite(np.asarray(qdd)))


def test_error_paths():
    with pytest.raises(UrdfError, match="floating joints not supported|floating"):
        parse_urdf_string(
            '<robot name="r"><link name="a"/><link name="b"/>'
            '<joint name="j" type="floating"><parent link="a"/><child link="b"/></joint></robot>'
        )
    with pytest.raises(UrdfError, match="base link"):
        parse_urdf_string(
            '<robot name="r"><link name="a"/><link name="b"/></robot>'
        )
    with pytest.raises(UrdfError, match="two parents"):
        parse_urdf_string(
            '<robot name="r"><link name="a"/><link name="b"/>'
            '<joint name="j1" type="fixed"><parent link="a"/><child link="b"/></joint>'
            '<joint name="j2" type="fixed"><parent link="a"/><child link="b"/></joint></robot>'
        )


def test_inertia_rpy_rotation():
    """Inertial origin rpy must rotate the inertia tensor
    (urdf_to_multi_body.hpp:184-190)."""
    text = """
    <robot name="r">
      <link name="world"/>
      <link name="l">
        <inertial><origin rpy="0 0 1.5707963267948966"/><mass value="1"/>
        <inertia ixx="1.0" iyy="2.0" izz="3.0"/></inertial>
      </link>
      <joint name="j" type="continuous"><parent link="world"/><child link="l"/>
      <axis xyz="0 0 1"/></joint>
    </robot>
    """
    model, _ = construct_from_string(text)
    # rotating diag(1,2,3) by 90 deg about z swaps xx and yy
    np.testing.assert_allclose(
        np.asarray(model.inertia[0]), np.diag([2.0, 1.0, 3.0]), atol=1e-12
    )
