"""Inclined-plane friction oracles (reference: examples/inclined_plane_gui.cpp).

The tilted plane is the classic ANALYTIC validation of the friction cone,
complementing the golden-trajectory and sys-id tests with closed-form
physics:

- static:  a block sticks iff tan(theta) <= mu
- kinetic: a sliding block accelerates at g*(sin(theta) - mu*cos(theta))
- rolling: a solid sphere with ample friction rolls at (5/7)*g*sin(theta),
  which exercises the torque coupling of the contact impulse (the tangent
  impulse must produce exactly the angular acceleration of roll-without-slip)

All cases run the flagship MLCP/PGS path (contact/mlcp.py) with a
non-axis-aligned plane normal — the only tests in the suite that tilt the
ground (every other world is z-up).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tds_tpu.contact.mlcp import ContactSolverParams
from tds_tpu.model.geometry import Box, GeomAttachment, Sphere
from tds_tpu.model.multibody import MultiBodyBuilder
from tds_tpu.world import build_world, make_ground_plane, world_step

G = 9.81
GRAVITY = jnp.array([0.0, 0.0, -G])


def _incline_world(theta, shape, inertia_diag, mass=1.0, friction=0.5,
                   pgs_iterations=20):
    """Free body on a plane tilted by ``theta`` about +y.

    Plane normal n = (-sin t, 0, cos t); downhill unit vector is
    u = (-cos t, 0, -sin t) (gravity component orthogonal to n)."""
    n = (-math.sin(theta), 0.0, math.cos(theta))
    b = MultiBodyBuilder(is_floating=True, name="body")
    b.set_base_inertia(mass, (0, 0, 0), np.diag(inertia_diag))
    body = b.finalize()
    geom = GeomAttachment(link_index=-1, shape=shape, friction=friction)
    plane_model, plane_geoms = make_ground_plane(normal=n)
    solver = ContactSolverParams(
        friction=friction, pgs_iterations=pgs_iterations
    )
    world = build_world(
        [(plane_model, plane_geoms), (body, (geom,))], solver=solver
    )
    return world, body, jnp.asarray(n)


def _simulate(world, body, q0, steps, dt=1e-3):
    qs = (jnp.zeros(0), q0)
    qds = (jnp.zeros(0), body.zero_qd())
    taus = (jnp.zeros(0), jnp.zeros(0))

    def step(carry, _):
        qs, qds = carry
        qs, qds = world_step(world, qs, qds, taus, GRAVITY, dt)
        return (qs, qds), (qs[1], qds[1])

    (qs, qds), (q_traj, qd_traj) = jax.lax.scan(
        step, (qs, qds), None, length=steps
    )
    return np.asarray(q_traj), np.asarray(qd_traj)


def _box_q0(theta, half, n):
    """Box oriented flush with the incline, bottom face just touching.

    Orientation: rotation about y by -theta maps local +z to the plane
    normal. Floating q layout: [qx,qy,qz,qw, x,y,z]."""
    quat = (0.0, math.sin(-theta / 2.0), 0.0, math.cos(theta / 2.0))
    pos = (half - 1e-4) * n  # tiny penetration activates the contacts
    return jnp.concatenate(
        [jnp.asarray(quat, jnp.float64), pos.astype(jnp.float64)]
    )


def _downhill_speed(qd_traj, theta):
    u = np.array([-math.cos(theta), 0.0, -math.sin(theta)])
    return qd_traj[:, 3:6] @ u


def test_block_sticks_below_friction_angle():
    # tan(15 deg) = 0.27 < mu = 0.6 -> static friction holds the block
    theta, mu = math.radians(15.0), 0.6
    extents = (0.2, 0.2, 0.2)
    inertia = Box(extents).local_inertia(1.0)
    world, body, n = _incline_world(theta, Box(extents), inertia, friction=mu)
    q, qd = _simulate(world, body, _box_q0(theta, 0.1, n), steps=600)
    speed = _downhill_speed(qd, theta)
    # after the initial impulse transient, the block is at rest
    assert abs(speed[-1]) < 5e-3, speed[-1]
    assert np.all(np.abs(speed[300:]) < 1e-2)
    # and it has not crept downhill (Baumgarte keeps it on the surface)
    drift = np.linalg.norm(q[-1, 4:7] - q[0, 4:7])
    assert drift < 5e-3, drift


def test_block_slides_at_analytic_acceleration():
    # tan(30 deg) = 0.58 > mu = 0.2 -> slides at g*(sin t - mu*cos t)
    theta, mu = math.radians(30.0), 0.2
    extents = (0.2, 0.2, 0.2)
    inertia = Box(extents).local_inertia(1.0)
    world, body, n = _incline_world(theta, Box(extents), inertia, friction=mu)
    q, qd = _simulate(world, body, _box_q0(theta, 0.1, n), steps=800)
    speed = _downhill_speed(qd, theta)
    # steady sliding: fit acceleration between 0.3 s and 0.7 s
    a_meas = (speed[699] - speed[299]) / 0.4
    a_ref = G * (math.sin(theta) - mu * math.cos(theta))
    assert abs(a_meas - a_ref) / a_ref < 0.03, (a_meas, a_ref)
    # no tipping: orientation stays within a degree of the initial one
    quat_drift = np.abs(q[-1, 0:4] - q[0, 0:4]).max()
    assert quat_drift < 0.02, quat_drift


def test_sphere_rolls_without_slipping():
    # ample friction: solid sphere rolls at a = g*sin(t)/(1 + 2/5)
    theta, mu, r = math.radians(20.0), 0.8, 0.5
    inertia = [0.4 * r * r] * 3  # solid sphere, m = 1
    world, body, n = _incline_world(theta, Sphere(r), inertia, friction=mu)
    q0 = jnp.concatenate(
        [
            jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float64),
            ((r - 1e-4) * n).astype(jnp.float64),
        ]
    )
    q, qd = _simulate(world, body, q0, steps=800)
    speed = _downhill_speed(qd, theta)
    a_meas = (speed[699] - speed[299]) / 0.4
    a_ref = G * math.sin(theta) / (1.0 + 0.4)
    assert abs(a_meas - a_ref) / a_ref < 0.05, (a_meas, a_ref)
    # roll-without-slip: |omega| == v / r (omega about the y axis)
    omega_y = qd[699, 1]
    assert abs(abs(omega_y) - speed[699] / r) / (speed[699] / r) < 0.05, (
        omega_y, speed[699] / r
    )
