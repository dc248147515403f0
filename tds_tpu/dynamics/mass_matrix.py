"""Composite Rigid Body Algorithm (CRBA) — joint-space inertia matrix.

Mirrors src/dynamics/mass_matrix.hpp:12-132 including the spherical-joint
6x3 blocks and the floating-base 6x6 corner. The ancestor walk is unrolled
at trace time (static topology).

TPU note: entries accumulate into a Python dict of batched scalars and the
matrix materializes with ONE stack at the end — per-entry ``.at[]`` updates
on a (batch, n, n) buffer would each copy the whole buffer (megabytes of
HBM traffic per entry at production batch sizes).
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
    qd0 = jnp.zeros(q.shape[:-1] + (model.dof_qd,), dtype=q.dtype)
    return mass_matrix_from_kin(model, fk_links(model, q, qd0), q)


def mass_matrix_from_kin(model: MultiBodyModel, kin, q):
    """CRBA over a precomputed FK pass (only the q-dependent x_parent
    transforms and the RBI-seeded articulated inertias are read, both
    velocity-independent)."""
    nl = model.num_links
    dtype = q.dtype
    batch = q.shape[:-1]
    n = model.dof_qd
    ic = list(kin.abi)  # composite inertias, seeded with link RBIs
    base_ic = (
        ArticulatedBodyInertia.from_rbi(model.base_rbi())
        if model.is_floating
        else None
    )

    entries = {}  # (row, col) -> batched scalar

    def set_entry(r, c, val):
        entries[(r, c)] = val

    def set_block(r0, c0, block, rows, cols):
        for r in range(rows):
            for c in range(cols):
                set_entry(r0 + r, c0 + c, block[..., r, c])

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
            set_block(qi, qi, jnp.swapaxes(s, -1, -2) @ fi, 3, 3)
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
                    set_block(qi, qj, hij, 3, 3)
                    set_block(qj, qi, jnp.swapaxes(hij, -1, -2), 3, 3)
                else:
                    sj = model.motion_subspace(j)
                    hij = jnp.einsum("...ji,...j->...i", fi, sj)  # (…,3)
                    for r in range(3):
                        set_entry(qi + r, qj, hij[..., r])
                        set_entry(qj, qi + r, hij[..., r])
            if model.is_floating:
                fi = kin.x_parent[j].force_matrix_to_parent(fi)
                for r in range(6):
                    for c in range(3):
                        set_entry(r, qi + c, fi[..., r, c])
                        set_entry(qi + c, r, fi[..., r, c])
        else:
            s = model.motion_subspace(i)
            fi = ic[i].mul_motion(s)  # (…,6)
            set_entry(qi, qi, spatial.dot(s, fi))
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
                    for r in range(3):
                        set_entry(qi, qj + r, hij[..., r])
                        set_entry(qj + r, qi, hij[..., r])
                else:
                    sj = model.motion_subspace(j)
                    val = spatial.dot(fi, sj)
                    set_entry(qi, qj, val)
                    set_entry(qj, qi, val)
            if model.is_floating:
                fi = kin.x_parent[j].force_to_parent(fi)
                for r in range(6):
                    set_entry(r, qi, fi[..., r])
                    set_entry(qi, r, fi[..., r])

    if model.is_floating:
        set_block(0, 0, base_ic.matrix(), 6, 6)

    zero = jnp.zeros(batch, dtype=dtype)
    # entries mix batched values with unbatched trace-time constants (leaf
    # composite inertias are model constants); broadcast before stacking
    rows = [
        jnp.stack(
            [
                jnp.broadcast_to(
                    jnp.asarray(entries.get((r, c), zero), dtype), batch
                )
                for c in range(n)
            ],
            axis=-1,
        )
        for r in range(n)
    ]
    return jnp.stack(rows, axis=-2)
