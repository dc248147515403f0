#!/usr/bin/env python
"""Simulate a double pendulum and stream it to a MeshCat viewer.

The tds_tpu analog of the reference's python/examples/d_meshcat_tinymultibody.py:
build a multibody, step ABA dynamics, push sphere transforms over the
MeshCat ZMQ wire protocol. If no meshcat-server is listening the frames are
captured by a RecordingConnection instead, so the example always runs.

Run: PYTHONPATH=. python examples/meshcat_pendulum.py [zmq_url]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from tds_tpu.dynamics import forward_dynamics, integrate_euler
from tds_tpu.dynamics.kinematics import forward_kinematics_q
from tds_tpu.model.pendulum import compound_pendulum
from tds_tpu.visualizer.meshcat import (
    MeshcatVisualizer,
    RecordingConnection,
    ZmqConnection,
)


def connect(url):
    try:
        conn = ZmqConnection(url, timeout_ms=500)
        # probe: REQ/REP must round-trip, otherwise the server is absent
        conn.sock.send_multipart([b"wait", b"", b""])
        conn.sock.recv()
        print(f"streaming to meshcat at {url}")
        return conn, True
    except Exception as e:
        print(f"no meshcat server ({type(e).__name__}); recording frames instead")
        return RecordingConnection(), False


def main():
    url = sys.argv[1] if len(sys.argv) > 1 else "tcp://127.0.0.1:6000"
    conn, live = connect(url)
    vis = MeshcatVisualizer(connection=conn)
    vis.set_ground_plane()
    vis.set_sphere("/tds/bob0", 0.08, color=0x22AA99)
    vis.set_sphere("/tds/bob1", 0.08, color=0xCC3366)

    model = compound_pendulum(2)
    gravity = jnp.array([0.0, 0.0, -9.81])
    dt = 1e-3

    @jax.jit
    def step(q, qd):
        qdd = forward_dynamics(model, q, qd, jnp.zeros(2), gravity)
        return integrate_euler(model, q, qd, qdd, dt)

    @jax.jit
    def bob_positions(q):
        _, link_x_world, _ = forward_kinematics_q(model, q)
        return jnp.stack([x.pos for x in link_x_world])

    q, qd = jnp.array([1.2, 0.0]), jnp.zeros(2)
    frames = 0
    for i in range(1500):
        q, qd = step(q, qd)
        if i % 15 == 0:  # ~66 Hz of wall traffic at 1 kHz sim
            pos = bob_positions(q)
            lift = jnp.array([0.0, 0.0, 1.5])
            vis.set_transform("/tds/bob0", lift + pos[0])
            vis.set_transform("/tds/bob1", lift + pos[1])
            frames += 1
    if live:
        print(f"streamed {frames} frames")
    else:
        print(f"recorded {len(conn.commands)} meshcat commands "
              f"({frames} animation frames)")


if __name__ == "__main__":
    main()
