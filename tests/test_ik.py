"""Inverse kinematics core tests (reference: tiny_inverse_kinematics.h).

The panda arm (7R+2P, 9 DoF) is the workhorse: a redundant chain where
Jacobian-transpose, pseudo-inverse, and damped-LM must all reach a world
target. Also pins the q_reference semantics: a POST-STEP blend toward the
reference pose (tiny_inverse_kinematics.h:235), not a term inside the LM
normal equations — the round-3 bug put it in the rhs without the matching
Tikhonov diagonal, which walked the solution ~1 m away from the target
even at weight 1e-3.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tds_tpu.control.ik import IKMethod, IKTarget, inverse_kinematics
from tds_tpu.dynamics.kinematics import forward_kinematics_q
from tds_tpu.urdf.cache import construct

HOME_Q = jnp.asarray(
    (0.0, 0.2, 0.0, -2.0, 0.0, 2.2, 0.79, 0.02, 0.02), jnp.float64
)
EE = 11  # panda_grasptarget
TARGET = jnp.asarray((0.45, 0.1, 0.3), jnp.float64)


@pytest.fixture(scope="module")
def panda():
    model, _ = construct("franka_panda/panda.urdf", dtype=jnp.float64)
    return model


def _ee_pos(model, q):
    _, xw, _ = forward_kinematics_q(model, q)
    return np.asarray(xw[EE].pos)


@pytest.mark.parametrize(
    "method,iters,tol",
    [
        (IKMethod.DAMPED_LM, 200, 1e-3),
        (IKMethod.JAC_PINV, 300, 1e-3),
        (IKMethod.JAC_TRANSPOSE, 800, 5e-3),
    ],
)
def test_all_methods_reach_target(panda, method, iters, tol):
    res = inverse_kinematics(
        panda, [IKTarget(EE, TARGET)], HOME_Q, method=method,
        max_iterations=iters, alpha=0.1, target_tolerance=tol,
    )
    assert float(res.residual) < tol, float(res.residual)
    np.testing.assert_allclose(_ee_pos(panda, res.q), TARGET, atol=2 * tol)


def test_q_reference_blend_converges(panda):
    # regression: with the reference-pose attraction enabled the solver
    # must still reach the target (post-step blend, not an rhs bias)
    res = inverse_kinematics(
        panda, [IKTarget(EE, TARGET)], HOME_Q,
        method=IKMethod.DAMPED_LM, max_iterations=300,
        q_reference=HOME_Q, q_reference_weight=1e-3,
    )
    assert float(res.residual) < 2e-3, float(res.residual)
    # and the attraction does its job: closer to the home pose than the
    # unregularized solution on the redundant DoF
    free = inverse_kinematics(
        panda, [IKTarget(EE, TARGET)], HOME_Q,
        method=IKMethod.DAMPED_LM, max_iterations=300,
    )
    d_ref = float(jnp.linalg.norm(res.q - HOME_Q))
    d_free = float(jnp.linalg.norm(free.q - HOME_Q))
    assert d_ref <= d_free + 1e-6, (d_ref, d_free)


def test_body_point_offset(panda):
    # a target specified for a point offset in the link frame
    bp = jnp.asarray((0.0, 0.0, 0.05), jnp.float64)
    res = inverse_kinematics(
        panda, [IKTarget(EE, TARGET, body_point=bp)], HOME_Q,
        method=IKMethod.DAMPED_LM, max_iterations=200,
    )
    assert float(res.residual) < 1e-3
    _, xw, _ = forward_kinematics_q(panda, res.q)
    world_pt = np.asarray(xw[EE].apply_point(bp))
    np.testing.assert_allclose(world_pt, TARGET, atol=2e-3)


def test_multi_target_laikago_toes():
    # the MPC-style use: all four toes pinned simultaneously (8 of 12 DoF
    # constrained through four separate leg chains)
    model, _ = construct(
        "laikago/laikago_toes_zup_xyz_xyzrot.urdf", dtype=jnp.float64
    )
    toe_links = [i for i, n in enumerate(model.link_names) if "toe" in n]
    assert len(toe_links) == 4, model.link_names
    q0 = model.zero_q().at[6].set(0.48)  # stand height on the passive base
    _, xw, _ = forward_kinematics_q(model, q0)
    # ask every toe to drop 3 cm from its current pose
    targets = [
        IKTarget(li, xw[li].pos + jnp.asarray([0.0, 0.0, -0.03], jnp.float64))
        for li in toe_links
    ]
    res = inverse_kinematics(
        model, targets, q0, method=IKMethod.DAMPED_LM, max_iterations=100
    )
    assert float(res.residual) < 1e-3, float(res.residual)
    _, xw2, _ = forward_kinematics_q(model, res.q)
    for li, t in zip(toe_links, targets):
        np.testing.assert_allclose(
            np.asarray(xw2[li].pos), np.asarray(t.position), atol=2e-3
        )


def test_panda_pushes_box():
    """End-to-end manipulation: IK stroke -> PD tracking -> EE sphere
    pushes a free box through the MLCP across ground friction
    (examples/panda_push.py at reduced length)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.panda_push import (
        BOX_START_X, build_scene, ik_waypoints, make_rollout,
    )

    world, arm, box = build_scene()
    q0, q1 = ik_waypoints(arm)
    rollout = jax.jit(make_rollout(world, arm, box, q0, q1, steps=700))
    qs, qds, box_x, box_z = jax.block_until_ready(rollout())
    box_x = np.asarray(box_x)
    assert np.all(np.isfinite(box_x))
    moved = box_x[-1] - BOX_START_X
    assert moved > 0.05, f"box only moved {moved * 100:.1f} cm"
    # box slides on the ground, it does not tumble or sink
    box_z = np.asarray(box_z)
    assert np.all(np.abs(box_z - 0.03) < 0.01), (box_z.min(), box_z.max())


def test_batched_q0(panda):
    # batched q0 solves all problems at once and matches per-item solves
    targets = jnp.asarray((0.45, 0.1, 0.3), jnp.float64)
    q0s = jnp.stack([HOME_Q, HOME_Q + 0.05, HOME_Q - 0.05])
    res = inverse_kinematics(
        panda, [IKTarget(EE, targets)], q0s,
        method=IKMethod.DAMPED_LM, max_iterations=200,
    )
    assert res.q.shape == (3, panda.dof_q)
    assert res.residual.shape == (3,)
    assert np.all(np.asarray(res.residual) < 1e-3), res.residual
