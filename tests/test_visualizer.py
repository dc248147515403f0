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

def test_zmq_round_trip_against_stub_server():
    """Full socket round trip: ZmqConnection REQ -> stub meshcat REP server.

    Verifies the 3-part wire format ([type, path, msgpack payload]) crosses
    a real ZMQ socket and the REQ/REP handshake completes — the transport
    layer of meshcat_zmq.h:270-292, previously only unit-tested via
    RecordingConnection.
    """
    import threading

    import msgpack
    import zmq

    from tds_tpu.visualizer.meshcat import MeshcatVisualizer, ZmqConnection

    ctx = zmq.Context.instance()
    rep = ctx.socket(zmq.REP)
    port = rep.bind_to_random_port("tcp://127.0.0.1")
    received = []

    def serve(n):
        for _ in range(n):
            parts = rep.recv_multipart()
            received.append(parts)
            rep.send(b"ok")

    t = threading.Thread(target=serve, args=(3,), daemon=True)
    t.start()

    conn = ZmqConnection(f"tcp://127.0.0.1:{port}", timeout_ms=5000)
    viz = MeshcatVisualizer(connection=conn)
    viz.set_sphere("/tds/ball", 0.25, color=0x112233)
    viz.set_transform("/tds/ball", [1.0, 2.0, 3.0])
    viz.delete("/tds/ball")
    t.join(timeout=10)
    assert not t.is_alive()
    rep.close(linger=0)

    assert len(received) == 3
    for parts in received:
        assert len(parts) == 3  # [cmd_type, path, payload]
    types = [p[0].decode() for p in received]
    assert types == ["set_object", "set_transform", "delete"]

    obj = msgpack.unpackb(received[0][2])
    assert obj["type"] == "set_object" and obj["path"] == "/tds/ball"
    assert obj["object"]["geometries"][0]["radius"] == 0.25

    xform = msgpack.unpackb(received[1][2])
    assert xform["matrix"][12:15] == [1.0, 2.0, 3.0]  # column-major translation


def test_zmq_connection_recovers_from_missed_reply():
    """A server that never replies must not wedge the REQ socket (EFSM);
    the connection resets and later sends still reach a live server."""
    import threading

    import zmq

    from tds_tpu.visualizer.meshcat import MeshcatVisualizer, ZmqConnection

    ctx = zmq.Context.instance()
    # ROUTER has no REP-style FSM, so the stub can drop one request and
    # still serve the next; frames are [identity, empty, type, path, payload]
    router = ctx.socket(zmq.ROUTER)
    port = router.bind_to_random_port("tcp://127.0.0.1")

    dropped = threading.Event()
    got = []

    def serve():
        router.recv_multipart()  # swallow request 1, send no reply
        dropped.set()
        parts = router.recv_multipart()  # request 2 (from the reset socket)
        got.append(parts[2:])
        router.send_multipart([parts[0], b"", b"ok"])

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    conn = ZmqConnection(f"tcp://127.0.0.1:{port}", timeout_ms=300)
    viz = MeshcatVisualizer(connection=conn)
    viz.delete("/x")  # reply never comes -> internal reconnect
    assert dropped.wait(timeout=5)

    viz.delete("/y")  # the reset connection must still deliver
    t.join(timeout=10)
    router.close(linger=0)
    assert not t.is_alive()
    assert got and got[0][0] == b"delete" and got[0][1] == b"/y"
