"""Multi-process jax.distributed validation (SURVEY §5 distributed backend).

Spawns two real OS processes, each with 2 virtual CPU devices, joined via
jax.distributed into one 4-device mesh, and runs a sharded ARS training
step (tests/distributed_worker.py). Asserts both processes compute the
same updated policy and that it matches a single-process 4-device run of
the identical program — the multi-process analog of
tests/test_parallel.py's sharded-vs-single-device equality.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def two_process_params():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), "2"],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)
    params = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("PARAMS")][0]
        params.append(np.array([float(x) for x in line.split()[1:]]))
    return params


def test_two_processes_agree(two_process_params):
    np.testing.assert_array_equal(two_process_params[0], two_process_params[1])


def test_matches_single_process(two_process_params):
    """Single process, 4 local devices, same program -> identical params."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    script = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_enable_x64', True);"
        "import sys; sys.path.insert(0, %r);"
        "from distributed_worker import run_ars_step;"
        "from tds_tpu.parallel.distributed import global_mesh;"
        "print('PARAMS', ' '.join('%%.17g' %% x for x in run_ars_step(global_mesh())))"
        % os.path.dirname(WORKER)
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        env=env,
        timeout=420,
        check=True,
    ).stdout
    line = [l for l in out.splitlines() if l.startswith("PARAMS")][0]
    single = np.array([float(x) for x in line.split()[1:]])
    np.testing.assert_allclose(two_process_params[0], single, rtol=0, atol=1e-12)
