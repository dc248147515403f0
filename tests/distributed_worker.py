"""Worker script for the 2-process jax.distributed test.

Each process owns 2 virtual CPU devices; jax.distributed.initialize joins
them into a 4-device global mesh. The worker runs one sharded ARS training
step on cartpole and prints the resulting parameter vector so the parent
test can assert (a) both processes agree and (b) the result matches a
single-process 4-device run bit-for-bit.

Usage: python distributed_worker.py <coordinator_port> <process_id> <num_processes>
"""

import os
import sys


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from tds_tpu.parallel.distributed import global_mesh, initialize_distributed

    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, len(jax.devices())

    params = run_ars_step(global_mesh())
    print("PARAMS", " ".join(f"{x:.17g}" for x in params), flush=True)


def run_ars_step(mesh):
    """One sharded ARS step at REAL shape — the laikago contact env
    (MLCP solve + collision every step) under a 500-step lax.scan — so the
    cross-process jax.distributed path exercises the same scan x GSPMD
    interplay the single-process dryrun does (round-4 review demand).
    Returns the updated policy params (gathered to host). Shared by the
    worker and the single-process oracle."""
    import jax
    import numpy as np

    from tds_tpu.envs.laikago import LaikagoEnv
    from tds_tpu.learn.ars import ARSConfig, init_ars, make_train_step
    from tds_tpu.learn.nn import linear_policy

    env = LaikagoEnv()
    policy = linear_policy(env.observation_dim, env.action_dim)
    config = ARSConfig(
        num_directions=4, rollout_length=500, delta_std=0.03, step_size=0.02
    )
    step_fn = make_train_step(env, policy, config, mesh=mesh)
    state = init_ars(env, policy, jax.random.PRNGKey(0))
    state, _ = step_fn(state)
    # Force a replicated layout so every process holds the full vector,
    # then read the local shard (valid in single- and multi-process runs).
    from jax.sharding import NamedSharding, PartitionSpec

    replicated = jax.jit(
        lambda x: x, out_shardings=NamedSharding(mesh, PartitionSpec())
    )(state.params)
    return np.asarray(replicated.addressable_data(0))


if __name__ == "__main__":
    main()
