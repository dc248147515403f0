"""The package must work WITHOUT the reference checkout mounted.

Round-1 gap (VERDICT.md "What's missing" #1): every env resolved URDFs only
through /root/reference/data. These tests set TDS_TPU_NO_REFERENCE_DATA so
file_utils skips that fallback, then load every bundled robot and run the
flagship env end-to-end from package-local assets alone.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def no_reference_data(monkeypatch):
    monkeypatch.setenv("TDS_TPU_NO_REFERENCE_DATA", "1")
    monkeypatch.delenv("TDS_TPU_DATA_PATH", raising=False)
    # drop any caches keyed on previously-resolved reference paths
    from tds_tpu.urdf import cache

    cache.clear_cache()


BUNDLED = [
    ("cartpole.urdf", False),
    ("pendulum5.urdf", False),
    ("pendulum5spherical.urdf", False),
    ("laikago/laikago_toes_zup.urdf", True),
    ("laikago/laikago_toes_zup_xyz_xyzrot.urdf", False),
    ("gym/ant_org_xyz_xyzrot.urdf", False),
    ("hopper_link0_1.urdf", False),
    ("cheetah_link0_1.urdf", False),
    ("humanoid.urdf", True),
    # emulates its floating base with an xyz+spherical passive chain
    ("humanoid_xyz_spherical.urdf", False),
    ("swimmer/swimmer05/swimmer05.urdf", False),
    ("franka_panda/panda.urdf", False),
]


@pytest.mark.parametrize("name,floating", BUNDLED)
def test_bundled_asset_loads_and_simulates(no_reference_data, name, floating):
    from tds_tpu.dynamics import forward_dynamics
    from tds_tpu.urdf.cache import construct
    from tds_tpu.utils.file_utils import find_file

    path = find_file(name)
    assert "/root/reference" not in path, f"{name} resolved to reference mount"
    model, _ = construct(name, is_floating=floating)
    qdd = forward_dynamics(
        model,
        model.zero_q(),
        model.zero_qd(),
        jnp.zeros(model.dof_actuated),
        jnp.array([0.0, 0.0, -9.81]),
    )
    assert np.all(np.isfinite(np.asarray(qdd))), name


def test_laikago_env_runs_standalone(no_reference_data):
    from tds_tpu.envs.laikago import LaikagoEnv

    env = LaikagoEnv()
    state, obs = env.reset(jax.random.PRNGKey(0))
    for _ in range(5):
        state, obs, reward, done = env.step(
            state, jnp.zeros(env.action_dim, state.q.dtype)
        )
    assert np.all(np.isfinite(np.asarray(obs)))


def test_mocap_asset_bundled(no_reference_data):
    from tds_tpu.utils.file_utils import find_file

    path = find_file("laikago_dance_sidestep0.txt")
    assert "/root/reference" not in path
