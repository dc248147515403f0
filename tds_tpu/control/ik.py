"""Inverse kinematics: Jacobian transpose / pseudo-inverse / damped LM.

Analog of src/tiny_inverse_kinematics.h:29-254 (methods enum :53-57).
Multi-target, fixed-iteration (lax.scan) so it jits and batches; the
q_reference regularization term for damped-LM matches the reference's
secondary-task weighting.
"""

import enum
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tds_tpu.dynamics.jacobian import point_jacobian
from tds_tpu.dynamics.kinematics import forward_kinematics_q
from tds_tpu.model.multibody import MultiBodyModel


class IKMethod(enum.IntEnum):
    JAC_TRANSPOSE = 0
    JAC_PINV = 1
    DAMPED_LM = 2


class IKTarget(NamedTuple):
    link_index: int  # static
    position: jnp.ndarray  # (3,) world target
    body_point: jnp.ndarray = None  # (3,) point in link frame (default origin)


class IKResult(NamedTuple):
    q: jnp.ndarray
    residual: jnp.ndarray  # final Euclidean error norm
    converged: jnp.ndarray  # residual <= tolerance


def inverse_kinematics(
    model: MultiBodyModel,
    targets: Sequence[IKTarget],
    q0,
    method: IKMethod = IKMethod.DAMPED_LM,
    max_iterations: int = 20,
    alpha: float = 0.5,
    lambda_: float = 0.02,
    target_tolerance: float = 1e-3,
    q_reference=None,
    q_reference_weight: float = 0.0,
) -> IKResult:
    """Iterative IK over all targets stacked into one least-squares system.

    Only position targets on revolute/prismatic chains are supported (same
    scope as the reference). Quaternion coordinates (spherical joints /
    floating base) are not updated by this routine.
    """
    nt = len(targets)
    dtype = q0.dtype

    def residual_and_jac(q):
        base_x, lxw, _ = forward_kinematics_q(model, q)
        errs, jacs = [], []
        for t in targets:
            bp = (
                jnp.zeros(3, dtype)
                if t.body_point is None
                else jnp.asarray(t.body_point, dtype)
            )
            world_pt = lxw[t.link_index].apply_point(bp)
            errs.append(jnp.asarray(t.position, dtype) - world_pt)
            jacs.append(point_jacobian(model, q, t.link_index, world_pt))
        return jnp.concatenate(errs, axis=-1), jnp.concatenate(jacs, axis=-2)

    def body(carry, _):
        q, _ = carry
        e, jac = residual_and_jac(q)
        if method == IKMethod.JAC_TRANSPOSE:
            dq = alpha * (jnp.swapaxes(jac, -1, -2) @ e[..., None])[..., 0]
        elif method == IKMethod.JAC_PINV:
            dq = (jnp.linalg.pinv(jac) @ e[..., None])[..., 0]
        else:  # damped Levenberg-Marquardt
            jt = jnp.swapaxes(jac, -1, -2)
            n = jac.shape[-1]
            a = jt @ jac + (lambda_**2) * jnp.eye(n, dtype=dtype)
            rhs = jt @ e[..., None]
            dq = jnp.linalg.solve(a, rhs)[..., 0]
        q = q + dq
        # reference-pose attraction: a post-step blend toward q_reference,
        # matching tiny_inverse_kinematics.h:235 (qi += w*(q_ref - qi) each
        # iteration, every method) — NOT a Tikhonov term in the normal
        # equations, which would need a matching w*I in `a` to be stable.
        if q_reference is not None and q_reference_weight > 0:
            q = q + q_reference_weight * (jnp.asarray(q_reference, dtype) - q)
        return (q, jnp.linalg.norm(e, axis=-1)), None

    # carry residual must match the body's batch-shaped norm or batched q0
    # fails at trace time
    res0 = jnp.full(q0.shape[:-1], jnp.inf, dtype)
    (q, res), _ = jax.lax.scan(
        body, (q0, res0), None, length=max_iterations
    )
    e_final, _ = residual_and_jac(q)
    res = jnp.linalg.norm(e_final, axis=-1)
    return IKResult(q=q, residual=res, converged=res <= target_tolerance)
