"""Multi-chip scaling via jax.sharding over a device Mesh.

The physics batch axis is the only scaling axis of this domain (SURVEY
sec 2.6): env batches shard over a 1-D ``data`` mesh; XLA turns the ARS
reductions (direction-weighted delta sum, observation-filter moments) into
ICI collectives. This replaces the reference's threads/OpenMP/CUDA steppers
and single-GPU launch (ars_vectorized_environment.h:68-161) with
compiler-partitioned SPMD.

Usage:
    mesh = make_mesh()
    step = make_train_step(env, policy, config, mesh=mesh)  # learn.ars
or for raw batched stepping:
    qs = shard_batch(qs, mesh)  # place batch axis across devices
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, PartitionSpec(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(tree, mesh: Mesh, axis_name: str = "data"):
    """Place every leaf's leading axis across the mesh (device_put)."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def constrain_batch(tree, mesh: Optional[Mesh], axis_name: str = "data"):
    """Inside-jit sharding constraint on the leading batch axis; no-op when
    mesh is None. GSPMD propagates the layout through the whole rollout and
    inserts psum/all-gather where the program reduces across the batch."""
    if mesh is None:
        return tree
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, sh), tree
    )
