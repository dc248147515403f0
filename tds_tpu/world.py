"""Functional world: bodies + collision geometry + contact resolution.

The reference's World (src/world.hpp:29-368) owns bodies and solvers and
mutates them in step(); here the world is a static description and
``resolve_contacts`` / ``world_step`` are pure functions over the tuple of
body states. Pair enumeration (including base geoms, link-vs-link across
bodies, world.hpp:206-282) happens at trace time from the static geometry
lists, producing fixed-size masked contact batches.

Matching the reference's division of labor: World.step resolves contact
impulses on qd; the caller runs forward dynamics and integration around it
(see the env step call stack, locomotion_contact_simulation.h:151-271).
"""

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import struct

from tds_tpu.collision import narrowphase
from tds_tpu.collision.narrowphase import Contact
from tds_tpu.contact.mlcp import ContactBatch, ContactSolverParams, resolve_collision
from tds_tpu.contact.spring import SpringContactParams, resolve_collision_spring
from tds_tpu.dynamics.forward_dynamics import forward_dynamics
from tds_tpu.dynamics.integrator import integrate_euler_qdd, integrate_q
from tds_tpu.model.geometry import GeomAttachment, Plane
from tds_tpu.model.joints import JointType
from tds_tpu.model.multibody import MultiBodyBuilder, MultiBodyModel
from tds_tpu.algebra.transform import Transform
from tds_tpu.model.multibody import _np_rpy


@struct.dataclass
class World:
    bodies: Tuple[MultiBodyModel, ...]
    geoms: Tuple[Tuple[GeomAttachment, ...], ...] = struct.field(pytree_node=False)
    solver: ContactSolverParams = struct.field(
        pytree_node=False, default=ContactSolverParams()
    )
    # "mlcp" (impulse-level LCP, reference default) or "spring" (force-based
    # spring-damper, the smooth-gradient alternative)
    contact_model: str = struct.field(pytree_node=False, default="mlcp")
    # Pair friction semantics: "geom_min" = min of the two geoms' materials
    # (this library's default); "world_default" = always the solver's world
    # friction, matching the reference exactly (world.hpp:320-327 passes
    # default_friction for every pair regardless of URDF contact tags).
    friction_mode: str = struct.field(pytree_node=False, default="geom_min")
    spring: SpringContactParams = struct.field(
        pytree_node=False, default=SpringContactParams()
    )

    @property
    def num_bodies(self):
        return len(self.bodies)


def make_ground_plane(normal=(0.0, 0.0, 1.0), constant=0.0, dtype=None):
    """A zero-DoF body carrying an infinite plane (the reference builds the
    same via plane URDF -> static MultiBody)."""
    model = MultiBodyBuilder(name="ground").finalize(dtype=dtype)
    geom = GeomAttachment(link_index=-1, shape=Plane(tuple(normal), constant))
    return model, (geom,)


def build_world(
    bodies_and_geoms: Sequence[Tuple[MultiBodyModel, Sequence[GeomAttachment]]],
    solver: ContactSolverParams = ContactSolverParams(),
    contact_model: str = "mlcp",
    spring: SpringContactParams = SpringContactParams(),
    friction_mode: str = "geom_min",
) -> World:
    return World(
        bodies=tuple(b for b, _ in bodies_and_geoms),
        geoms=tuple(tuple(g) for _, g in bodies_and_geoms),
        solver=solver,
        contact_model=contact_model,
        spring=spring,
        friction_mode=friction_mode,
    )


def _geom_world_transform(kin, attachment: GeomAttachment, dtype):
    frame = (
        kin.base_x_world
        if attachment.link_index < 0
        else kin.x_world[attachment.link_index]
    )
    offset = Transform(
        pos=jnp.asarray(attachment.pos, dtype=dtype),
        rot=jnp.asarray(_np_rpy(*attachment.rpy), dtype=dtype),
    )
    return frame.compose(offset)


def gather_pair_contacts(
    world: World, kin_list, pair_a: int, pair_b: int, dtype
) -> Optional[ContactBatch]:
    """All candidate contacts between every geom of body a and b
    (world.hpp:206-282 link-pair loops), concatenated with static link ids."""
    contacts: List[Contact] = []
    link_a: List[int] = []
    link_b: List[int] = []
    frictions: List[float] = []
    restitutions: List[float] = []
    for ga in world.geoms[pair_a]:
        xa = _geom_world_transform(kin_list[pair_a], ga, dtype)
        for gb in world.geoms[pair_b]:
            if not narrowphase.supported(ga.shape, gb.shape):
                continue
            xb = _geom_world_transform(kin_list[pair_b], gb, dtype)
            c = narrowphase.compute_contacts(ga.shape, xa, gb.shape, xb)
            contacts.append(c)
            link_a += [ga.link_index] * c.count
            link_b += [gb.link_index] * c.count
            if world.friction_mode == "world_default":
                # exact reference semantics (world.hpp:320-327)
                frictions += [world.solver.friction] * c.count
                restitutions += [world.solver.restitution] * c.count
            else:
                # minimum-friction material of the two geoms
                frictions += [min(ga.friction, gb.friction)] * c.count
                restitutions += [max(ga.restitution, gb.restitution)] * c.count
    if not contacts:
        return None
    return ContactBatch(
        contact=Contact.concatenate(contacts),
        link_a=tuple(link_a),
        link_b=tuple(link_b),
        friction=jnp.asarray(frictions, dtype=dtype),
        restitution=jnp.asarray(restitutions, dtype=dtype),
    )


def resolve_contacts(world: World, qs, qds, dt, kins=None, factors=None):
    """One contact-resolution pass over all body pairs; returns new qds.

    qs/qds are tuples (one entry per body; zero-DoF bodies hold shape-(0,)
    arrays). ``kins``: optional per-body precomputed :class:`KinLinks` (e.g.
    shared with the ABA pass of the same step); ``factors``: optional
    per-body :class:`AbaFactor` for the O(n) M^-1 J^T path.
    """
    from tds_tpu.dynamics.kinematics import fk_links

    dtype = None
    for q in qs:
        if q.shape[-1]:
            dtype = q.dtype
            break
    if dtype is None:
        return qds
    kin_list = [
        kins[i]
        if kins is not None and kins[i] is not None
        else fk_links(world.bodies[i], qs[i], jnp.zeros_like(qds[i]))
        for i in range(world.num_bodies)
    ]
    qds = list(qds)
    for i in range(world.num_bodies):
        for j in range(i + 1, world.num_bodies):
            if not world.geoms[i] or not world.geoms[j]:
                continue
            if world.bodies[i].dof_qd == 0 and world.bodies[j].dof_qd == 0:
                continue
            batch = gather_pair_contacts(world, kin_list, i, j, dtype)
            if batch is None:
                continue
            if world.contact_model == "spring":
                qd_a, qd_b, _ = resolve_collision_spring(
                    world.bodies[i], qs[i], qds[i],
                    world.bodies[j], qs[j], qds[j],
                    batch, dt, world.spring,
                    kin_a=kin_list[i], kin_b=kin_list[j],
                    factor_a=factors[i] if factors is not None else None,
                    factor_b=factors[j] if factors is not None else None,
                )
            else:
                qd_a, qd_b, _ = resolve_collision(
                    world.bodies[i], qs[i], qds[i],
                    world.bodies[j], qs[j], qds[j],
                    batch, dt, world.solver,
                    kin_a=kin_list[i], kin_b=kin_list[j],
                    factor_a=factors[i] if factors is not None else None,
                    factor_b=factors[j] if factors is not None else None,
                )
            qds[i], qds[j] = qd_a, qd_b
    return tuple(qds)


def world_step(world: World, qs, qds, taus, gravity, dt, f_exts=None):
    """Full step for all bodies: ABA -> velocity update -> contact impulses
    -> position update (the env-loop ordering,
    locomotion_contact_simulation.h:259-271). Returns (qs, qds)."""
    from tds_tpu.dynamics.forward_dynamics import aba_factor, forward_dynamics_from_kin
    from tds_tpu.dynamics.kinematics import fk_links

    new_qs, new_qds, kins, factors = [], [], [], []
    for i, model in enumerate(world.bodies):
        if model.dof_qd == 0:
            new_qs.append(qs[i])
            new_qds.append(qds[i])
            kins.append(None)
            factors.append(None)
            continue
        kin = fk_links(
            model, qs[i], qds[i],
            f_ext=f_exts[i] if f_exts is not None else None,
        )
        factor = aba_factor(model, kin)
        qdd = forward_dynamics_from_kin(
            model, kin, qs[i], qds[i],
            taus[i] if taus is not None else None,
            gravity, factor=factor,
        )
        new_qds.append(integrate_euler_qdd(model, qs[i], qds[i], qdd, dt))
        new_qs.append(qs[i])
        kins.append(kin)
        factors.append(factor)
    new_qds = list(
        resolve_contacts(
            world, tuple(new_qs), tuple(new_qds), dt, kins=kins, factors=factors
        )
    )
    out_qs, out_qds = [], []
    for i, model in enumerate(world.bodies):
        if model.dof_qd == 0:
            out_qs.append(new_qs[i])
            out_qds.append(new_qds[i])
            continue
        q, qd = integrate_q(model, new_qs[i], new_qds[i], dt)
        out_qs.append(q)
        out_qds.append(qd)
    return tuple(out_qs), tuple(out_qds)
