"""Composite Rigid Body Algorithm (CRBA) — joint-space inertia matrix.

Mirrors src/dynamics/mass_matrix.hpp:12-132 including the spherical-joint
6x3 blocks and the floating-base 6x6 corner. The ancestor walk is unrolled
at trace time (static topology), so M assembles from static .at[] updates.
"""

import jax.numpy as jnp

from tds_tpu.algebra import spatial
from tds_tpu.algebra.inertia import ArticulatedBodyInertia
from tds_tpu.dynamics.kinematics import fk_links
from tds_tpu.model.joints import JointType
from tds_tpu.model.multibody import MultiBodyModel


def mass_matrix(model: MultiBodyModel, q):
    """Returns M of shape (…, dof_qd, dof_qd), symmetric positive definite
    for well-posed models."""
    nl = model.num_links
    dtype = q.dtype
    batch = q.shape[:-1]
    n = model.dof_qd

    qd0 = jnp.zeros(batch + (n,), dtype=dtype)
    kin = fk_links(model, q, qd0)
    ic = list(kin.abi)  # composite inertias, seeded with link RBIs
    base_ic = (
        ArticulatedBodyInertia.from_rbi(model.base_rbi())
        if model.is_floating
        else None
    )

    m = jnp.zeros(batch + (n, n), dtype=dtype)

    for i in reversed(range(nl)):
        jt = JointType(model.joint_types[i])
        parent = model.parents[i]
        delta_i = kin.x_parent[i].abi_to_parent(ic[i])
        if parent >= 0:
            ic[parent] = ic[parent] + delta_i
        elif model.is_floating:
            base_ic = base_ic + delta_i

        if jt == JointType.FIXED:
            continue
        qi = model.qd_offsets[i]

        if jt == JointType.SPHERICAL:
            s = model.motion_subspace(i)
            fi = ic[i].mul_matrix63(s)  # (…,6,3)
            m = m.at[..., qi : qi + 3, qi : qi + 3].set(
                jnp.swapaxes(s, -1, -2) @ fi
            )
            j = i
            while model.parents[j] != -1:
                fi = kin.x_parent[j].force_matrix_to_parent(fi)
                j = model.parents[j]
                if model.joint_types[j] == JointType.FIXED:
                    continue
                qj = model.qd_offsets[j]
                if model.joint_types[j] == JointType.SPHERICAL:
                    sj = model.motion_subspace(j)
                    hij = jnp.swapaxes(fi, -1, -2) @ sj  # (…,3,3)
                    m = m.at[..., qi : qi + 3, qj : qj + 3].set(hij)
                    m = m.at[..., qj : qj + 3, qi : qi + 3].set(
                        jnp.swapaxes(hij, -1, -2)
                    )
                else:
                    sj = model.motion_subspace(j)
                    hij = jnp.einsum("...ji,...j->...i", fi, sj)  # (…,3)
                    m = m.at[..., qi : qi + 3, qj].set(hij)
                    m = m.at[..., qj, qi : qi + 3].set(hij)
            if model.is_floating:
                fi = kin.x_parent[j].force_matrix_to_parent(fi)
                m = m.at[..., 0:6, qi : qi + 3].set(fi)
                m = m.at[..., qi : qi + 3, 0:6].set(jnp.swapaxes(fi, -1, -2))
        else:
            s = model.motion_subspace(i)
            fi = ic[i].mul_motion(s)  # (…,6)
            m = m.at[..., qi, qi].set(spatial.dot(s, fi))
            j = i
            while model.parents[j] != -1:
                fi = kin.x_parent[j].force_to_parent(fi)
                j = model.parents[j]
                if model.joint_types[j] == JointType.FIXED:
                    continue
                qj = model.qd_offsets[j]
                if model.joint_types[j] == JointType.SPHERICAL:
                    sj = model.motion_subspace(j)
                    hij = jnp.einsum("...ji,...j->...i", sj, fi)
                    m = m.at[..., qi, qj : qj + 3].set(hij)
                    m = m.at[..., qj : qj + 3, qi].set(hij)
                else:
                    sj = model.motion_subspace(j)
                    val = spatial.dot(fi, sj)
                    m = m.at[..., qi, qj].set(val)
                    m = m.at[..., qj, qi].set(val)
            if model.is_floating:
                fi = kin.x_parent[j].force_to_parent(fi)
                m = m.at[..., 0:6, qi].set(fi)
                m = m.at[..., qi, 0:6].set(fi)

    if model.is_floating:
        m = m.at[..., 0:6, 0:6].set(base_ic.matrix())
    return m
