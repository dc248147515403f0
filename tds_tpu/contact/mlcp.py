"""Impulse-level contact resolution: MLCP assembly + projected Gauss-Seidel.

Faithful functional reimplementation of MultiBodyConstraintSolver
(src/mb_constraint_solver.hpp:41-552):

- row layout [normals(n_c) | friction1(n_c) | friction2(n_c)]
- b_i = -(1+restitution)*vn - erp*d/dt, rows masked by collision = (d < 0)
  exactly like the reference's traced/codegen path (:285-325)
- A = J M^-1 J^T + cfm*I (:397-412)
- PGS with friction bounds scaled by the current normal impulse
  (limit_dependency coupling, :122-135), iterations/row sweeps unrolled at
  trace time
- velocity impulse qd_a += M_a^-1 J_a^T p, qd_b -= M_b^-1 J_b^T p (:454-497)

Divergence from the reference (documented): friction plane-space vectors are
normalized (the reference's plane_space uses k = sqrt(a) instead of
1/sqrt(a), mb_constraint_solver.hpp:506-519, leaving non-unit directions for
non-axis-aligned normals; for the z-up ground planes of all shipped
environments the two coincide).
"""

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tds_tpu.collision.narrowphase import Contact
from tds_tpu.algebra import smallmat as sm
from tds_tpu.dynamics.jacobian import point_jacobian_kin
from tds_tpu.dynamics.kinematics import fk_links
from tds_tpu.dynamics.mass_matrix import mass_matrix_from_kin
from tds_tpu.model.multibody import MultiBodyModel
from tds_tpu.algebra.update import set_index


class ContactSolverParams(NamedTuple):
    """Solver knobs (defaults per mb_constraint_solver.hpp:60-70)."""

    pgs_iterations: int = 1
    erp: float = 0.2
    cfm: float = 1e-5
    num_friction_dir: int = 2
    friction: float = 0.5  # world default (world.hpp:68)
    restitution: float = 0.0
    # How M^-1 J^T is computed: "aba" = O(n) Featherstone propagation from
    # ABA byproducts (replaces the reference's dense CRBA + inverse,
    # mb_constraint_solver.hpp:210-262); "crba" = explicit mass matrix +
    # tree-sparse Cholesky (kept for cross-validation).
    minv_method: str = "aba"
    # PGS sweep backend: "xla" (unrolled jnp ops, fused into the step) or
    # "pallas" (lane-major Mosaic kernel, contact/pallas_pgs.py). Pallas
    # requires a leading batch axis on the contact state.
    pgs_impl: str = "xla"
    # Candidate compaction: keep only the top_k deepest candidates per
    # contact batch before Delassus assembly + PGS (0 = keep all). A
    # statically-shaped take_along_axis gather (scatter-free); selected
    # indices are re-sorted to candidate order, so whenever <= top_k
    # candidates actually penetrate the compacted system solves the SAME
    # active rows in the SAME PGS sweep order — identical impulses. Only
    # when more than top_k candidates penetrate at once are the shallowest
    # dropped. This is the many-candidate throughput lever: the ant's 17
    # plane candidates cost a 51-row MLCP, of which at most ~8 are ever
    # active in a walking gait (measured; see PROGRESS.md round 5).
    top_k: int = 0
    # Delassus (J M^-1 J^T) contraction precision: "f32" (default) or
    # "bf16" — cast the J / M^-1 J^T row blocks to bfloat16 for the
    # contraction with f32 accumulation (preferred_element_type), the MXU's
    # native mode. Impulse magnitudes see ~3 decimal digits of A-matrix
    # precision; PGS itself stays f32. A measured-accuracy/throughput
    # trade knob (VERDICT r4 #2c).
    delassus_dtype: str = "f32"


def plane_space(n):
    """Two unit tangent vectors orthogonal to n (normalized Bullet variant
    of mb_constraint_solver.hpp:506-544), branchless."""
    n_sqr = n[..., 2] * n[..., 2]
    mostly_z = n_sqr > 0.5
    a = n[..., 1] * n[..., 1] + jnp.where(mostly_z, n_sqr, n[..., 0] * n[..., 0])
    k = 1.0 / jnp.sqrt(jnp.maximum(a, 1e-30))
    zero = jnp.zeros_like(k)
    p = jnp.stack(
        [
            jnp.where(mostly_z, zero, -n[..., 1] * k),
            jnp.where(mostly_z, -n[..., 2] * k, n[..., 0] * k),
            jnp.where(mostly_z, n[..., 1] * k, zero),
        ],
        axis=-1,
    )
    q = jnp.cross(n, p)
    return p, q


def solve_pgs(a_mat, b, lo, hi, limit_dependency, x0, iterations: int):
    """Projected Gauss-Seidel with impulse-coupled bounds, unrolled.

    ``limit_dependency[i] >= 0`` scales row i's bounds by
    max(x[dep], 0) — the Coulomb cone coupling (mb_constraint_solver.hpp:122-135).
    """
    n = len(limit_dependency)
    x = x0
    for _ in range(iterations):
        for i in range(n):
            # sum-multiply, not einsum: batched dot_general trips an MLIR
            # attribute bug in the axon plugin's Mosaic when this code runs
            # inside a Pallas kernel (and the VPU form fuses identically)
            delta = jnp.sum(a_mat[..., i, :] * x, axis=-1) - (
                a_mat[..., i, i] * x[..., i]
            )
            xi = (b[..., i] - delta) / a_mat[..., i, i]
            dep = limit_dependency[i]
            if dep >= 0:
                s = jnp.maximum(x[..., dep], 0.0)
            else:
                s = jnp.ones_like(xi)
            xi = jnp.clip(xi, lo[..., i] * s, hi[..., i] * s)
            x = set_index(x, i, xi)
    return x


class ContactBatch(NamedTuple):
    """Candidate contacts between one pair of bodies, with static link ids."""

    contact: Contact  # leaves (…, k, 3)/(…, k)
    link_a: Tuple[int, ...]  # static, len k
    link_b: Tuple[int, ...]
    friction: jnp.ndarray  # (k,) or (…, k)
    restitution: jnp.ndarray


def resolve_collision(
    model_a: MultiBodyModel,
    q_a,
    qd_a,
    model_b: MultiBodyModel,
    q_b,
    qd_b,
    batch: ContactBatch,
    dt,
    params: ContactSolverParams = ContactSolverParams(),
    kin_a=None,
    kin_b=None,
    factor_a=None,
    factor_b=None,
):
    """Returns (qd_a', qd_b', impulses) after resolving the contact batch.

    Either body may have zero DoF (e.g. a static ground plane).
    ``kin_a``/``kin_b``: optional precomputed :class:`KinLinks` so the FK
    pass is shared with ABA within a step. ``factor_a``/``factor_b``:
    optional precomputed :class:`AbaFactor` (shared with the dynamics ABA)
    used by the O(n) M^-1 J^T path.
    """
    n_a, n_b = model_a.dof_qd, model_b.dof_qd
    n_c = batch.contact.count
    if n_c == 0 or (n_a == 0 and n_b == 0):
        return qd_a, qd_b, None
    dtype = batch.contact.distance.dtype
    dpc = 1 + params.num_friction_dir
    n_rows = dpc * n_c

    cp = batch.contact
    collision = (cp.distance < 0.0).astype(dtype)  # (…, k)

    if kin_a is None and n_a:
        kin_a = fk_links(model_a, q_a, jnp.zeros_like(qd_a))
    if kin_b is None and n_b:
        kin_b = fk_links(model_b, q_b, jnp.zeros_like(qd_b))

    # M^-1 J^T: either the O(n) ABA-byproduct propagation (default; factor
    # shared with the dynamics ABA of the same step), or explicit CRBA +
    # tree-sparse unrolled Cholesky. Both avoid jnp.linalg (which lowers to
    # sequential LU while-loops on TPU).
    if params.minv_method == "aba":
        from tds_tpu.dynamics.forward_dynamics import aba_factor, minv_mul

        if factor_a is None and n_a:
            factor_a = aba_factor(model_a, kin_a)
        if factor_b is None and n_b:
            factor_b = aba_factor(model_b, kin_b)

        def make_solver(model, kin, fac):
            def minv_rows(rows):  # (…, R, n) -> (…, R, n) = J M^-1
                return jnp.moveaxis(
                    minv_mul(model, kin, fac, jnp.moveaxis(rows, -2, 0)), 0, -2
                )

            return minv_rows

        solve_a = make_solver(model_a, kin_a, factor_a) if n_a else None
        solve_b = make_solver(model_b, kin_b, factor_b) if n_b else None
    else:
        from tds_tpu.algebra.linalg import (
            cho_solve_unrolled,
            cholesky_unrolled,
            symbolic_cholesky_fill,
        )

        # Factorization runs in REVERSED dof order (leaves first) so the
        # tree coupling structure is fill-free; the symbolic pattern prunes
        # structurally-zero products at trace time.
        def make_solver(model, kin, q):
            patt = symbolic_cholesky_fill(model.dof_coupling_mask()[::-1, ::-1])
            m = mass_matrix_from_kin(model, kin, q)[..., ::-1, ::-1]
            chol = cholesky_unrolled(m, patt)

            def minv_rows(rows):  # (…, R, n) -> (…, R, n)
                rhs = jnp.swapaxes(rows, -1, -2)[..., ::-1, :]
                out = cho_solve_unrolled(chol, rhs, patt)[..., ::-1, :]
                return jnp.swapaxes(out, -1, -2)

            return minv_rows

        solve_a = make_solver(model_a, kin_a, q_a) if n_a else None
        solve_b = make_solver(model_b, kin_b, q_b) if n_b else None

    bshape = q_a.shape[:-1] if n_a else q_b.shape[:-1]

    def jac(model, kin, link, point):
        return point_jacobian_kin(
            model, kin.base_x_world, kin.x_world, None, link, point,
            batch=bshape, dtype=dtype,
        )

    rows_a = []  # (…, 3n_rows? ) rows for body a: list of (…, n_a)
    rows_b = []
    b_vec = []  # list of (…,) rhs entries, normal block then fr1, fr2
    jacs_a_n, jacs_b_n = [], []  # per-candidate 3xN point jacobians

    normals, fr1s, fr2s, rel_vels = [], [], [], []
    for i in range(n_c):
        # lax.slice_in_dim, not int indexing: jnp's int-index read lowers to
        # gather, which Mosaic (Pallas) cannot lower
        col_i = jax.lax.slice_in_dim(collision, i, i + 1, axis=-1)
        normal = cp.normal_on_b[..., i, :] * col_i
        ja = jac(model_a, kin_a, batch.link_a[i], cp.point_a[..., i, :]) if n_a else None
        jb = jac(model_b, kin_b, batch.link_b[i], cp.point_b[..., i, :]) if n_b else None
        jacs_a_n.append(ja)
        jacs_b_n.append(jb)
        vel_a = sm.mv(ja, qd_a) if n_a else 0.0
        vel_b = sm.mv(jb, qd_b) if n_b else 0.0
        rel_vel = vel_a - vel_b
        rel_vels.append(rel_vel)
        vn = jnp.sum(cp.normal_on_b[..., i, :] * rel_vel, axis=-1)
        baumgarte = params.erp * cp.distance[..., i] / dt
        rest = batch.restitution[..., i] if batch.restitution.ndim else batch.restitution
        b_n = (-(1.0 + rest) * vn - baumgarte) * col_i[..., 0]
        normals.append(normal)
        b_vec.append(b_n)
        f1, f2 = plane_space(cp.normal_on_b[..., i, :])
        fr1s.append(f1 * col_i)
        fr2s.append(f2 * col_i)

    # friction rhs blocks
    fr1_b = [-jnp.sum(fr1s[i] * rel_vels[i], axis=-1) for i in range(n_c)]
    fr2_b = [-jnp.sum(fr2s[i] * rel_vels[i], axis=-1) for i in range(n_c)]

    # --- top-k candidate compaction (see ContactSolverParams.top_k) -----
    # Everything row-shaped downstream (J rows, Delassus, PGS) scales with
    # n_rows = dpc*n_c, so shrinking the candidate set here cuts the
    # dominant O(n_rows^2) terms quadratically. Indices are SORTED back to
    # candidate order after top_k so the PGS sweep visits surviving rows in
    # the original order — bit-compatible with the full system whenever all
    # penetrating candidates survive the cut.
    fric_full = (
        batch.friction
        if batch.friction.ndim
        else jnp.full((n_c,), batch.friction, dtype=dtype)
    )
    if 0 < params.top_k < n_c:
        k = params.top_k
        # deepest first: most-negative distance = largest -distance
        _, idx = jax.lax.top_k(-cp.distance, k)  # (…, k)
        idx = jnp.sort(idx, axis=-1)
        # selection as a one-hot contraction, NOT take_along_axis: gather
        # does not lower in the plugin's Mosaic (tests/test_pallas_compat)
        # and is slow on TPU regardless; a (k, n_c) 0/1 matmul is exact in
        # f32 and rides the VPU/MXU
        onehot = (idx[..., :, None] == jnp.arange(n_c)).astype(dtype)

        def take_vec(xs):  # list of (…,) -> k-list of (…,)
            st = jnp.stack(xs, axis=-1)
            g = jnp.einsum("...kc,...c->...k", onehot, st)
            return [g[..., i] for i in range(k)]

        def take_dir(xs):  # list of (…, 3) -> k-list of (…, 3)
            st = jnp.stack(xs, axis=-2)
            g = jnp.einsum("...kc,...cd->...kd", onehot, st)
            return [g[..., i, :] for i in range(k)]

        def take_jac(xs):  # list of (…, 3, n) -> k-list of (…, 3, n)
            if xs[0] is None:
                return [None] * k
            st = jnp.stack(xs, axis=-3)
            g = jnp.einsum("...kc,...cdn->...kdn", onehot, st)
            return [g[..., i, :, :] for i in range(k)]

        normals, fr1s, fr2s = take_dir(normals), take_dir(fr1s), take_dir(fr2s)
        b_vec, fr1_b, fr2_b = take_vec(b_vec), take_vec(fr1_b), take_vec(fr2_b)
        jacs_a_n, jacs_b_n = take_jac(jacs_a_n), take_jac(jacs_b_n)
        if fric_full.ndim == 1:  # (n_c,) static per-candidate friction
            fric_full = jnp.einsum("...kc,c->...k", onehot, fric_full)
        else:
            fric_full = jnp.einsum("...kc,...c->...k", onehot, fric_full)
        n_c = k
        n_rows = dpc * n_c

    def proj(jacs, direction):
        """J^T d per candidate -> constraint row (…, n)."""
        return [sm.mtv(jacs[i], direction[i]) for i in range(n_c)]

    def stack_rows(rows):
        return jnp.stack(rows, axis=-2)  # (…, n_rows, n)

    dirs = [normals, fr1s] + ([fr2s] if params.num_friction_dir > 1 else [])
    rhs_blocks = [b_vec, fr1_b] + ([fr2_b] if params.num_friction_dir > 1 else [])

    j_a = stack_rows(sum((proj(jacs_a_n, d) for d in dirs), [])) if n_a else None
    j_b = stack_rows(sum((proj(jacs_b_n, d) for d in dirs), [])) if n_b else None
    rhs = jnp.stack(sum(rhs_blocks, []), axis=-1)  # (…, n_rows)

    # Delassus product J (M^-1 J^T). smallmat's broadcast+reduce form
    # materializes a (batch, n_rows, n_rows, n) intermediate — fine for the
    # few-contact case it was tuned on, but O(n_rows^2 * n) HBM traffic once
    # many contacts stack up. Above the threshold this is one large
    # contraction, exactly what dot_general/the MXU is for.
    def _delassus(j, jminv):
        if params.delassus_dtype == "bf16":
            return jnp.einsum(
                "...ik,...jk->...ij",
                j.astype(jnp.bfloat16),
                jminv.astype(jnp.bfloat16),
                preferred_element_type=dtype,
            )
        if n_rows > 16:
            return jnp.einsum("...ik,...jk->...ij", j, jminv)
        return sm.mmt(j, jminv)

    a_mat = jnp.zeros(bshape + (n_rows, n_rows), dtype=dtype)
    jminv_a = jminv_b = None  # (…, n_rows, n) rows of J M^-1
    if n_a:
        jminv_a = solve_a(j_a)
        a_mat = a_mat + _delassus(j_a, jminv_a)
    if n_b:
        jminv_b = solve_b(j_b)
        a_mat = a_mat + _delassus(j_b, jminv_b)
    a_mat = a_mat + params.cfm * jnp.eye(n_rows, dtype=dtype)

    big = 1e5
    fric = fric_full
    lo = jnp.concatenate(
        [jnp.zeros(bshape + (n_c,), dtype=dtype)]
        + [-jnp.broadcast_to(fric, bshape + (n_c,))] * params.num_friction_dir,
        axis=-1,
    )
    hi = jnp.concatenate(
        [jnp.full(bshape + (n_c,), big, dtype=dtype)]
        + [jnp.broadcast_to(fric, bshape + (n_c,))] * params.num_friction_dir,
        axis=-1,
    )
    limit_dependency = [-1] * n_c
    for d in range(params.num_friction_dir):
        limit_dependency += list(range(n_c))

    x0 = jnp.zeros(bshape + (n_rows,), dtype=dtype)
    if params.pgs_impl == "pallas" and bshape:
        from tds_tpu.contact.pallas_pgs import solve_pgs_pallas

        p = solve_pgs_pallas(
            a_mat.reshape((-1, n_rows, n_rows)),
            rhs.reshape((-1, n_rows)),
            lo.reshape((-1, n_rows)),
            hi.reshape((-1, n_rows)),
            limit_dependency,
            params.pgs_iterations,
        ).reshape(bshape + (n_rows,))
    else:
        p = solve_pgs(
            a_mat, rhs, lo, hi, limit_dependency, x0, params.pgs_iterations
        )

    if n_a:
        qd_a = qd_a + sm.mtv(jminv_a, p)
    if n_b:
        qd_b = qd_b - sm.mtv(jminv_b, p)
    return qd_a, qd_b, p
