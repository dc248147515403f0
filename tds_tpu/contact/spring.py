"""Force-based nonlinear spring-damper contact ("soft" contact model).

The reference ships this as MultiBodyConstraintSolverSpring (absent from the
snapshot's sources but fully specified by its binding surface,
python/pytinydiffsim.inl:825-856: spring_k, damper_d, exponent_n,
hard_contact_condition, velocity smoothing sigmoid/tanh/abs, Coulomb /
Andersson friction models) and recommends it for smooth gradients through
contact. This implementation:

- normal force  f_n = spring_k * p^exponent_n + damper_d * max(-vn, 0) * p^exponent_n
  with penetration p = max(-d, 0): continuous at p = 0, differentiable for
  exponent_n >= 1 (Hunt-Crossley-style penetration-gated damping)
- friction models:
  * coulomb: f_t = -mu * f_n * smooth_dir(v_t)
  * andersson: mu(v) = mu_k + (mu_s - mu_k) exp(-(|v|/vs)^p), scaled by
    tanh(ktanh |v|)  [Andersson et al. 2007]
- velocity smoothing of the friction direction: none / sigmoid / tanh / abs
- forces enter the velocities as qd += dt * M^-1 J^T f (generalized forces),
  the force-level analog of the MLCP impulse application
"""

import enum
from typing import NamedTuple

import jax.numpy as jnp

from tds_tpu.contact.mlcp import ContactBatch
from tds_tpu.dynamics.jacobian import point_jacobian_kin
from tds_tpu.dynamics.kinematics import fk_links
from tds_tpu.dynamics.mass_matrix import mass_matrix_from_kin
from tds_tpu.model.multibody import MultiBodyModel


class VelocitySmoothing(enum.IntEnum):
    NONE = 0
    SIGMOID = 1
    TANH = 2
    ABS = 3


class FrictionModel(enum.IntEnum):
    NONE = 0
    COULOMB = 1
    ANDERSSON = 2


class SpringContactParams(NamedTuple):
    """Defaults follow the reference binding surface
    (pytinydiffsim.inl:825-856)."""

    spring_k: float = 5000.0
    damper_d: float = 100.0
    exponent_n: float = 1.0
    hard_contact_condition: bool = True
    smoothing_method: int = VelocitySmoothing.NONE
    smooth_alpha_vel: float = 100.0
    smooth_alpha_normal: float = -1.0  # <=0: hard penetration gate
    mu_static: float = 0.5
    mu_kinetic: float = 0.5
    andersson_vs: float = 0.1
    andersson_p: float = 1.0
    andersson_ktanh: float = 10.0
    v_transition: float = 0.01
    friction_model: int = FrictionModel.COULOMB


def _smooth_dir(v_t, speed, params: SpringContactParams):
    """Unit-ish direction of tangential velocity with smoothing near zero."""
    m = params.smoothing_method
    if m == VelocitySmoothing.SIGMOID:
        scale = 1.0 / (1.0 + jnp.exp(-params.smooth_alpha_vel * speed)) * 2.0 - 1.0
    elif m == VelocitySmoothing.TANH:
        scale = jnp.tanh(params.smooth_alpha_vel * speed)
    elif m == VelocitySmoothing.ABS:
        scale = speed / (jnp.abs(speed) + params.v_transition)
    else:
        scale = jnp.ones_like(speed)
    safe = jnp.maximum(speed, 1e-9)
    return v_t / safe[..., None] * scale[..., None]


def compute_contact_force(distance, vn, params: SpringContactParams):
    """Scalar normal force magnitude (>= 0) for signed distance + normal
    velocity (vn > 0 means separating)."""
    if params.smooth_alpha_normal and params.smooth_alpha_normal > 0:
        p = jnp.logaddexp(0.0, -params.smooth_alpha_normal * distance) / (
            params.smooth_alpha_normal
        )
    else:
        p = jnp.maximum(-distance, 0.0)
    in_contact = (p > 0).astype(p.dtype)
    pn = jnp.power(jnp.maximum(p, 1e-12), params.exponent_n) * in_contact
    # Kelvin-Voigt style: spring on penetration^n, damper on approach
    # velocity while penetrating (no adhesion: f >= 0 by construction)
    f = params.spring_k * pn + params.damper_d * jnp.maximum(-vn, 0.0) * in_contact
    if params.hard_contact_condition:
        f = jnp.where(distance < 0.0, f, 0.0)
    return f


def compute_friction_force(f_n, v_t, params: SpringContactParams):
    """Tangential force vector opposing the lateral velocity."""
    from tds_tpu.algebra.spatial import safe_norm

    speed = safe_norm(v_t, axis=-1)
    if params.friction_model == FrictionModel.NONE:
        return jnp.zeros_like(v_t)
    if params.friction_model == FrictionModel.ANDERSSON:
        mu = params.mu_kinetic + (params.mu_static - params.mu_kinetic) * jnp.exp(
            -jnp.power(speed / params.andersson_vs, params.andersson_p)
        )
        mag = mu * f_n * jnp.tanh(params.andersson_ktanh * speed)
        safe = jnp.maximum(speed, 1e-9)
        return -mag[..., None] * v_t / safe[..., None]
    # Coulomb
    direction = _smooth_dir(v_t, speed, params)
    return -(params.mu_kinetic * f_n)[..., None] * direction


def resolve_collision_spring(
    model_a: MultiBodyModel,
    q_a,
    qd_a,
    model_b: MultiBodyModel,
    q_b,
    qd_b,
    batch: ContactBatch,
    dt,
    params: SpringContactParams = SpringContactParams(),
    kin_a=None,
    kin_b=None,
    factor_a=None,
    factor_b=None,
):
    """Returns (qd_a', qd_b', forces) with contact forces integrated into
    the generalized velocities over dt."""
    n_a, n_b = model_a.dof_qd, model_b.dof_qd
    n_c = batch.contact.count
    if n_c == 0 or (n_a == 0 and n_b == 0):
        return qd_a, qd_b, None
    dtype = batch.contact.distance.dtype
    bshape = q_a.shape[:-1] if n_a else q_b.shape[:-1]

    if kin_a is None and n_a:
        kin_a = fk_links(model_a, q_a, jnp.zeros_like(qd_a))
    if kin_b is None and n_b:
        kin_b = fk_links(model_b, q_b, jnp.zeros_like(qd_b))

    def jac(model, kin, link, point):
        return point_jacobian_kin(
            model, kin.base_x_world, kin.x_world, None, link, point,
            batch=bshape, dtype=dtype,
        )

    gen_force_a = jnp.zeros(bshape + (n_a,), dtype=dtype) if n_a else None
    gen_force_b = jnp.zeros(bshape + (n_b,), dtype=dtype) if n_b else None
    forces = []
    cp = batch.contact
    for i in range(n_c):
        # normal points from b to a in the reference convention
        # (world_normal_on_b); positive vn separates
        normal = cp.normal_on_b[..., i, :]
        ja = jac(model_a, kin_a, batch.link_a[i], cp.point_a[..., i, :]) if n_a else None
        jb = jac(model_b, kin_b, batch.link_b[i], cp.point_b[..., i, :]) if n_b else None
        vel_a = jnp.einsum("...ij,...j->...i", ja, qd_a) if n_a else 0.0
        vel_b = jnp.einsum("...ij,...j->...i", jb, qd_b) if n_b else 0.0
        rel_vel = vel_a - vel_b
        vn = jnp.sum(normal * rel_vel, axis=-1)
        f_n = compute_contact_force(cp.distance[..., i], vn, params)
        v_t = rel_vel - vn[..., None] * normal
        f_t = compute_friction_force(f_n, v_t, params)
        # force on a along +normal (pushes a away from b) plus friction
        force = f_n[..., None] * normal + f_t
        forces.append(force)
        if n_a:
            gen_force_a = gen_force_a + jnp.einsum("...ij,...i->...j", ja, force)
        if n_b:
            gen_force_b = gen_force_b - jnp.einsum("...ij,...i->...j", jb, force)

    # M^-1 f: reuse the step's AbaFactor (O(n) Featherstone propagation,
    # shared with the MLCP branch) when available; dense CRBA + Cholesky
    # otherwise
    from tds_tpu.algebra.linalg import solve_pd
    from tds_tpu.dynamics.forward_dynamics import minv_mul

    if n_a:
        if factor_a is not None:
            qd_a = qd_a + dt * minv_mul(model_a, kin_a, factor_a, gen_force_a)
        else:
            qd_a = qd_a + dt * solve_pd(
                mass_matrix_from_kin(model_a, kin_a, q_a), gen_force_a
            )
    if n_b:
        if factor_b is not None:
            qd_b = qd_b + dt * minv_mul(model_b, kin_b, factor_b, gen_force_b)
        else:
            qd_b = qd_b + dt * solve_pd(
                mass_matrix_from_kin(model_b, kin_b, q_b), gen_force_b
            )
    return qd_a, qd_b, jnp.stack(forces, axis=-2)
