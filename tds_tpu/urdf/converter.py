"""UrdfStructures -> MultiBodyModel + collision attachments.

Mirrors src/urdf/urdf_to_multi_body.hpp:41-279:
- base link inertial becomes the base RBI (diag inertia rotated by rpy,
  COM from inertial origin)
- each joint i and its child link i become one Link: X_T from joint origin
  xyz/rpy, revolute/prismatic axes snapped to X/Y/Z when the axis is an
  exact unit vector (urdf_to_multi_body.hpp:115-156)
- collision shapes are attached with their offset transforms; per-link
  contact material (friction/restitution) carried from <contact>
- joint <dynamics damping> maps to the link's linear damping term
"""

from typing import List, Optional, Tuple

import numpy as np

from tds_tpu.model.geometry import (
    Box,
    Capsule,
    Cylinder,
    GeomAttachment,
    Mesh,
    Plane,
    Sphere,
)
from tds_tpu.model.joints import JointType
from tds_tpu.model.multibody import MultiBodyBuilder, MultiBodyModel
from tds_tpu.urdf.structures import UrdfStructures


def _inertia_com_and_matrix(inertial, convention: str = "reference"):
    """Returns (com, inertia_about_com) in the link frame.

    convention="reference" replicates the reference converter bit-for-bit
    (urdf_to_multi_body.hpp:52-67,184-190 + transform.hpp:385-404): only the
    DIAGONAL inertia entries are read, and Transform::apply(rbi) with a
    rotation-only transform maps I -> R^T I R and com -> R^T com (note the
    transpose — and that the COM offset is rotated along, unlike the URDF
    spec). convention="urdf" implements the spec: full tensor, R I R^T,
    COM left in the link frame.
    """
    from tds_tpu.model.multibody import _np_rpy

    r, p, y = inertial.origin_rpy
    rot = _np_rpy(r, p, y)
    com = np.asarray(inertial.origin_xyz, dtype=float)
    if convention == "reference":
        i = np.diag(inertial.inertia_xxyyzz)
        return rot.T @ com, rot.T @ i @ rot
    if inertial.inertia_full is not None:
        ixx, ixy, ixz, iyy, iyz, izz = inertial.inertia_full
        i = np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
    else:
        i = np.diag(inertial.inertia_xxyyzz)
    return com, rot @ i @ rot.T


_UNIT_AXES = {
    (1.0, 0.0, 0.0): 0,
    (0.0, 1.0, 0.0): 1,
    (0.0, 0.0, 1.0): 2,
}


def _joint_type(urdf_type: str, axis) -> Tuple[JointType, Tuple[float, float, float]]:
    axis = tuple(float(a) for a in axis)
    if urdf_type == "fixed":
        return JointType.FIXED, (1.0, 0.0, 0.0)
    if urdf_type == "spherical":
        return JointType.SPHERICAL, (1.0, 0.0, 0.0)
    if urdf_type in ("revolute", "continuous"):
        if axis in _UNIT_AXES:
            return (
                JointType(int(JointType.REVOLUTE_X) + _UNIT_AXES[axis]),
                axis,
            )
        return JointType.REVOLUTE_AXIS, axis
    if urdf_type == "prismatic":
        if axis in _UNIT_AXES:
            return (
                JointType(int(JointType.PRISMATIC_X) + _UNIT_AXES[axis]),
                axis,
            )
        return JointType.PRISMATIC_AXIS, axis
    raise ValueError(f"cannot convert joint type {urdf_type!r}")


def _shape(geom, mesh_contacts: int = 0):
    t = geom.geom_type
    if t == "sphere":
        return Sphere(geom.radius)
    if t == "box":
        return Box(tuple(geom.extents))
    if t == "capsule":
        return Capsule(geom.radius, geom.length)
    if t == "cylinder":
        return Cylinder(geom.radius, geom.length)
    if t == "plane":
        return Plane(tuple(geom.normal), geom.constant)
    if t == "mesh":
        # mesh_contacts > 0 opts the shape into the mesh narrowphase
        # (beyond reference; 0 keeps meshes visual-only as TDS does)
        return Mesh(
            geom.mesh_file, tuple(geom.mesh_scale),
            max_contacts=mesh_contacts,
        )
    raise ValueError(f"unknown geometry {t!r}")


def convert_to_multibody(
    urdf: UrdfStructures,
    is_floating: bool = False,
    dtype=None,
    use_joint_damping: bool = False,
    inertia_convention: str = "reference",
    mesh_contacts: int = 0,
) -> Tuple[MultiBodyModel, Tuple[GeomAttachment, ...]]:
    """Returns (model, collision attachments). Collision shapes for the base
    use link_index=-1."""
    b = MultiBodyBuilder(is_floating=is_floating, name=urdf.robot_name)
    base = urdf.base_links[0]
    base_com, base_inertia = _inertia_com_and_matrix(
        base.inertial, inertia_convention
    )
    b.set_base_inertia(base.inertial.mass, base_com, base_inertia)

    geoms: List[GeomAttachment] = []
    for col in base.collisions:
        if col.geometry.geom_type == "mesh" and mesh_contacts <= 0:
            # reference parity: collision meshes are ignored unless the
            # caller opts into the mesh narrowphase (mesh_contacts > 0)
            continue
        geoms.append(
            GeomAttachment(
                link_index=-1,
                shape=_shape(col.geometry, mesh_contacts),
                pos=tuple(col.origin_xyz),
                rpy=tuple(col.origin_rpy),
                friction=base.contact.lateral_friction,
                restitution=base.contact.restitution,
            )
        )

    for i, joint in enumerate(urdf.joints):
        link = urdf.links[i]
        jt, axis = _joint_type(joint.joint_type, joint.axis_xyz)
        com, inertia = _inertia_com_and_matrix(link.inertial, inertia_convention)
        b.add_link(
            jt,
            parent=link.parent_index,
            x_t_pos=joint.origin_xyz,
            x_t_rpy=joint.origin_rpy,
            axis=axis,
            mass=link.inertial.mass,
            com=com,
            inertia_about_com=inertia,
            # the reference converter drops URDF joint damping/friction
            # (urdf_to_multi_body.hpp never reads them); opt in explicitly
            damping=joint.damping if use_joint_damping else 0.0,
            link_name=link.link_name,
            joint_name=joint.joint_name,
        )
        for col in link.collisions:
            if col.geometry.geom_type == "mesh" and mesh_contacts <= 0:
                continue
            geoms.append(
                GeomAttachment(
                    link_index=i,
                    shape=_shape(col.geometry, mesh_contacts),
                    pos=tuple(col.origin_xyz),
                    rpy=tuple(col.origin_rpy),
                    friction=link.contact.lateral_friction,
                    restitution=link.contact.restitution,
                )
            )

    model = b.finalize(dtype=dtype)
    return model, tuple(geoms)


def load_urdf(path: str, is_floating: bool = False, dtype=None):
    """Parse + convert in one call (reference UrdfCache::construct,
    urdf_cache.hpp:75-86)."""
    from tds_tpu.urdf.parser import parse_urdf_file

    return convert_to_multibody(parse_urdf_file(path), is_floating, dtype)
