"""Programmatic pendulum builders + analytic double-pendulum oracle.

Mirrors src/utils/pendulum.hpp:10-56 (``init_compound_pendulum``): an
n-link chain of revolute-X joints, link i hanging a distance L below its
parent joint, with a point mass at the end of each rod.
"""

import jax.numpy as jnp
import numpy as np

from tds_tpu.model.joints import JointType
from tds_tpu.model.multibody import MultiBodyBuilder, MultiBodyModel


def compound_pendulum(
    num_links: int = 2,
    masses=None,
    link_length: float = 0.5,
    link_lengths=None,
    dtype=None,
) -> MultiBodyModel:
    """n-link compound pendulum swinging in the y-z plane (revolute X joints).

    Matches init_compound_pendulum (pendulum.hpp:10-56): each link's joint
    sits one link length below the parent joint (X_T translation (0,0,-L)
    for links i>0), the point mass sits at the link's COM offset (0, 0, -L).
    ``link_lengths`` gives per-link lengths (pendulum.hpp's optional
    vector, used by the real-data estimation example with the IBM
    pendulum's 0.091/0.070 m rods); ``link_length`` is the uniform
    fallback.
    """
    if masses is None:
        masses = [1.0] * num_links
    assert len(masses) == num_links
    if link_lengths is None:
        link_lengths = [link_length] * num_links
    assert len(link_lengths) == num_links
    b = MultiBodyBuilder(is_floating=False, name=f"pendulum{num_links}")
    for i in range(num_links):
        com = np.array([0.0, 0.0, -link_lengths[i]])
        b.add_link(
            JointType.REVOLUTE_X,
            parent=i - 1,
            x_t_pos=(0.0, 0.0, 0.0)
            if i == 0
            else (0.0, 0.0, -link_lengths[i - 1]),
            mass=masses[i],
            com=com,
            inertia_about_com=np.zeros((3, 3)),  # point mass
            link_name=f"link{i}",
            joint_name=f"joint{i}",
        )
    return b.finalize(dtype=dtype)


def spherical_pendulum(
    num_links: int = 2,
    masses=None,
    link_length: float = 0.5,
    dtype=jnp.float64,
) -> MultiBodyModel:
    """n-link chain of SPHERICAL joints (pendulum_spherical_joints.hpp
    analog): each link hangs ``link_length`` below its parent joint with a
    point mass at the rod end."""
    if masses is None:
        masses = [1.0] * num_links
    b = MultiBodyBuilder(is_floating=False, name=f"spherical_pendulum{num_links}")
    for i in range(num_links):
        b.add_link(
            JointType.SPHERICAL,
            parent=i - 1,
            x_t_pos=(0.0, 0.0, 0.0) if i == 0 else (0.0, 0.0, -link_length),
            mass=masses[i],
            com=np.array([0.0, 0.0, -link_length]),
            inertia_about_com=np.diag([1e-6, 1e-6, 1e-6]),  # near-point mass
            link_name=f"link{i}",
        )
    return b.finalize(dtype=dtype)


def double_pendulum_qdd(q, qd, m1=1.0, m2=1.0, l1=0.5, l2=0.5, g=9.81):
    """Closed-form accelerations of the planar double pendulum (point
    masses), the analytic oracle of pendulum.hpp:58-??.

    Angles are measured from the straight-down position, matching the
    compound_pendulum joint convention (q=0 hangs straight down); q2 is
    relative to link 1.
    """
    t1, t2 = q[..., 0], q[..., 1]
    w1, w2 = qd[..., 0], qd[..., 1]
    d = t2  # relative angle between rods
    den = m1 + m2 * jnp.sin(d) ** 2
    # standard double-pendulum equations in relative coordinates
    a1 = (
        m2 * l1 * w1**2 * jnp.sin(d) * jnp.cos(d)
        + m2 * g * jnp.sin(t1 + d) * jnp.cos(d)
        + m2 * l2 * (w1 + w2) ** 2 * jnp.sin(d)
        - (m1 + m2) * g * jnp.sin(t1)
    ) / (l1 * den)
    a2 = (
        -m2 * l2 * (w1 + w2) ** 2 * jnp.sin(d) * jnp.cos(d)
        - (m1 + m2) * (g * jnp.sin(t1) * jnp.cos(d) - g * jnp.sin(t1 + d) + l1 * w1**2 * jnp.sin(d))
    ) / (l2 * den) - a1
    return jnp.stack([a1, a2], axis=-1)
