"""Meshcat visualizer command-stream tests (no server needed)."""

import jax.numpy as jnp
import msgpack
import numpy as np

from tds_tpu.urdf.parser import parse_urdf_string
from tds_tpu.urdf.converter import convert_to_multibody
from tds_tpu.visualizer.meshcat import (
    MeshcatUrdfVisualizer,
    MeshcatVisualizer,
    RecordingConnection,
)

URDF = """
<robot name="viz">
  <link name="world"/>
  <link name="ball">
    <visual><geometry><sphere radius="0.25"/></geometry>
      <material name="m"><color rgba="1 0 0 1"/></material></visual>
    <inertial><mass value="1"/><inertia ixx="0.1" iyy="0.1" izz="0.1"/></inertial>
  </link>
  <joint name="j" type="continuous"><parent link="world"/><child link="ball"/>
    <origin xyz="0 0 1"/><axis xyz="1 0 0"/></joint>
</robot>
"""


def test_set_object_and_transform_stream():
    conn = RecordingConnection()
    viz = MeshcatVisualizer(connection=conn)
    viz.set_sphere("/tds/ball", 0.5, color=0xFF0000)
    viz.set_transform("/tds/ball", [1.0, 2.0, 3.0])
    viz.delete("/tds/ball")
    types = [c[0] for c in conn.commands]
    assert types == ["set_object", "set_transform", "delete"]
    obj = msgpack.unpackb(conn.commands[0][2])
    assert obj["object"]["geometries"][0]["type"] == "SphereGeometry"
    assert obj["object"]["geometries"][0]["radius"] == 0.5
    tf = msgpack.unpackb(conn.commands[1][2])
    assert tf["matrix"][12:15] == [1.0, 2.0, 3.0]


def test_urdf_visualizer_sync():
    urdf = parse_urdf_string(URDF)
    model, _ = convert_to_multibody(urdf)
    conn = RecordingConnection()
    viz = MeshcatUrdfVisualizer(MeshcatVisualizer(connection=conn))
    viz.convert_visuals(urdf, model)
    n_objects = len(conn.commands)
    assert n_objects == 1  # one sphere visual
    viz.sync_visual_transforms(model, jnp.asarray([0.0]))
    assert len(conn.commands) == n_objects + 1
    tf = msgpack.unpackb(conn.commands[-1][2])
    np.testing.assert_allclose(tf["matrix"][12:15], [0, 0, 1.0], atol=1e-12)
