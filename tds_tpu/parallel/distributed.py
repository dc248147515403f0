"""Multi-host scaling: jax.distributed bootstrap + host-spanning meshes.

The reference is single-process (SURVEY §2.6); its only cross-worker
communication is the ARS reward-weighted delta sum and obs-filter moments —
both plain reductions. Here those reductions already run through the mesh
(psum inserted by GSPMD), so multi-host = initialize the distributed
runtime and build a mesh over the global device list; DCN carries only the
tiny g_hat/moment all-reduces while env batches stay chip-local.

On a pod slice:
    initialize_distributed()          # reads cluster env (TPU autodetect)
    mesh = global_mesh()              # all chips across hosts, axis "data"
    step = make_train_step(env, policy, cfg, mesh=mesh)   # learn.ars
"""

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def _already_initialized() -> bool:
    """True if jax.distributed.initialize() has already run.

    Prefers the public jax.distributed.is_initialized() (added in newer JAX
    releases); falls back to probing the private global_state, degrading to
    False if internals moved so a rename can't break startup.
    """
    if hasattr(jax.distributed, "is_initialized"):
        return bool(jax.distributed.is_initialized())
    try:
        from jax._src import distributed as _jd

        return getattr(_jd.global_state, "client", None) is not None
    except Exception:
        return False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Bootstrap jax.distributed. On Cloud TPU pods all arguments
    autodetect; elsewhere pass them or set JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID."""
    # NB: don't probe jax.process_count() here — it would initialize the
    # XLA backend, after which jax.distributed.initialize() refuses to run.
    if _already_initialized():
        return
    kwargs = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    explicit = addr is not None
    if addr:
        kwargs["coordinator_address"] = addr
        kwargs["num_processes"] = int(
            num_processes or os.environ.get("JAX_NUM_PROCESSES", 1)
        )
        kwargs["process_id"] = int(
            process_id or os.environ.get("JAX_PROCESS_ID", 0)
        )
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:
        if explicit:
            # The caller configured a multi-process cluster; silently
            # degrading to 1 process would run the job on 1/Nth the devices.
            raise RuntimeError(
                f"jax.distributed.initialize failed with explicit coordinator "
                f"config {kwargs}: {e}"
            ) from e
        import logging

        logging.getLogger(__name__).warning(
            "jax.distributed.initialize failed (%s); continuing "
            "single-process. Set JAX_COORDINATOR_ADDRESS to make this fatal.",
            e,
        )


def global_mesh(axis_name: str = "data") -> Mesh:
    """1-D mesh over every device of every host."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def local_batch_size(global_batch: int) -> int:
    """Per-host slice of a globally sharded batch."""
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n


def is_primary() -> bool:
    """True on the host that should log/checkpoint."""
    return jax.process_index() == 0
