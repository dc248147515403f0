"""O(n) mass-matrix inverse (minv_mul) vs explicit CRBA factorization.

The contact solver's default M^-1 J^T path runs the zero-bias ABA sweeps
over the articulated factor (tds_tpu/dynamics/forward_dynamics.py:minv_mul),
replacing the reference's dense CRBA + symmetric inverse
(/root/reference/src/mb_constraint_solver.hpp:210-262). These tests pin the
two factorizations to each other at machine precision on every joint-type
surface (floating base, spherical joints, fixed-base emulation chains), and
pin the solver's "aba" and "crba" modes to identical contact impulses.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tds_tpu.dynamics.forward_dynamics import aba_factor, minv_mul
from tds_tpu.dynamics.kinematics import fk_links
from tds_tpu.dynamics.mass_matrix import mass_matrix
from tds_tpu.urdf.cache import construct

REF_DATA = "/root/reference/data"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference data not mounted"
)


def random_state(model, key, scale=0.5):
    kq, kqd = jax.random.split(key)
    q = model.zero_q() + scale * jax.random.normal(kq, (model.dof_q,))
    # re-normalize quaternion blocks
    if model.is_floating:
        q = q.at[0:4].set(q[0:4] / jnp.linalg.norm(q[0:4]))
    from tds_tpu.model.joints import JointType

    for i, jt in enumerate(model.joint_types):
        if jt == JointType.SPHERICAL:
            off = model.q_offsets[i]
            blk = q[off : off + 4]
            q = q.at[off : off + 4].set(blk / jnp.linalg.norm(blk))
    qd = scale * jax.random.normal(kqd, (model.dof_qd,))
    return q, qd


def check_minv(model, key, n_rhs=5):
    q, qd = random_state(model, key)
    kin = fk_links(model, q, jnp.zeros_like(qd))
    factor = aba_factor(model, kin)
    x = jax.random.normal(jax.random.fold_in(key, 7), (n_rhs, model.dof_qd))
    got = minv_mul(model, kin, factor, x)
    m = mass_matrix(model, q)
    want = jnp.linalg.solve(m, x.T).T
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-9)
    # round trip: M (M^-1 x) = x
    np.testing.assert_allclose(
        jnp.einsum("ij,rj->ri", m, got), x, rtol=1e-8, atol=1e-9
    )


@needs_ref
@pytest.mark.parametrize(
    "urdf",
    [
        "laikago/laikago_toes_zup.urdf",  # floating base, 12 revolute
        "gym/ant_org_xyz_xyzrot.urdf",  # fixed-base emulation chain
        "humanoid_xyz_spherical.urdf",  # spherical joints
    ],
)
def test_minv_matches_crba(urdf):
    model, _ = construct(urdf)
    for seed in range(3):
        check_minv(model, jax.random.PRNGKey(seed))


def test_minv_pendulum_programmatic():
    from tds_tpu.model.pendulum import compound_pendulum

    model = compound_pendulum(5)
    for seed in range(3):
        check_minv(model, jax.random.PRNGKey(seed))


@needs_ref
def test_contact_solver_aba_equals_crba():
    """The full contact resolution must be invariant to the minv method."""
    from tds_tpu.contact.mlcp import ContactSolverParams
    from tds_tpu.envs.laikago import LaikagoEnv

    impulses = {}
    for method in ("aba", "crba"):
        env = LaikagoEnv(solver=ContactSolverParams(minv_method=method))
        key = jax.random.PRNGKey(0)
        state, _ = env.reset(key)
        q, qd = state.q, state.qd
        for _ in range(20):
            q, qd = env.sim_step(q, qd, jnp.zeros(env.action_dim, q.dtype))
        impulses[method] = (q, qd)
    np.testing.assert_allclose(
        impulses["aba"][0], impulses["crba"][0], rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        impulses["aba"][1], impulses["crba"][1], rtol=1e-8, atol=1e-10
    )
