"""Convenience world assembly: URDF robot + ground plane in one call.

Analog of src/urdf/system_constructor.hpp (URDF + plane -> populated world
with actuation knobs).
"""

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from tds_tpu.contact.mlcp import ContactSolverParams
from tds_tpu.model.multibody import MultiBodyModel
from tds_tpu.urdf.cache import construct, construct_from_string
from tds_tpu.world import World, build_world, make_ground_plane


def system_constructor(
    urdf_filename: Optional[str] = None,
    urdf_string: Optional[str] = None,
    is_floating: bool = False,
    with_ground_plane: bool = True,
    joint_stiffness: float = 0.0,
    joint_damping: float = 0.0,
    solver: ContactSolverParams = ContactSolverParams(),
    contact_model: str = "mlcp",
    dtype=None,
) -> Tuple[MultiBodyModel, World]:
    """Returns (model, world). ``joint_stiffness``/``joint_damping`` are
    applied uniformly to all joints (system_constructor.hpp behavior)."""
    if urdf_filename is not None:
        model, geoms = construct(urdf_filename, is_floating=is_floating, dtype=dtype)
    elif urdf_string is not None:
        model, geoms = construct_from_string(
            urdf_string, is_floating=is_floating, dtype=dtype
        )
    else:
        raise ValueError("need urdf_filename or urdf_string")
    if joint_stiffness or joint_damping:
        model = model.replace(
            stiffness=jnp.full_like(model.stiffness, joint_stiffness),
            damping=jnp.full_like(model.damping, joint_damping),
        )
    entries = []
    if with_ground_plane:
        entries.append(make_ground_plane(dtype=dtype))
    entries.append((model, geoms))
    world = build_world(entries, solver=solver, contact_model=contact_model)
    return model, world
