"""Mesh-terrain locomotion (beyond reference: TDS locomotion worlds are
infinite planes, world.hpp:29-68).

The flagship check: the committed flat-ground ARS policy walks ZERO-SHOT
across a bumpy triangle-mesh terrain through the triangle-accurate
sphere_mesh narrowphase — measured 1.79 m / 1.5 s upright at commit time
(flat-ground actual is ~1.6 m/s)."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tds_tpu.model.geometry import Mesh
from tds_tpu.utils.terrain import heightfield_obj, write_heightfield

CKPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "logs", "laikago_ars", "policy_r2b.pkl",
)


def test_heightfield_obj_geometry(tmp_path):
    obj = heightfield_obj(
        3, 2, (0.0, 2.0), (0.0, 1.0), lambda x, y: x + 10.0 * y
    )
    from tds_tpu.native.mesh import load_obj

    verts, tris = load_obj(obj)
    assert verts.shape == (6, 3)
    assert tris.shape == (2 * 2 * 1, 3)
    # row-major in x: vertex (i=1, j=0) is (1, 0, 1), (i=2, j=1) is (2, 1, 12)
    np.testing.assert_allclose(verts[1], [1.0, 0.0, 1.0])
    np.testing.assert_allclose(verts[5], [2.0, 1.0, 12.0])
    # every triangle references valid vertices
    assert tris.min() >= 0 and tris.max() < 6


def test_heightfield_rejects_degenerate_grid():
    with pytest.raises(ValueError):
        heightfield_obj(1, 5, (0, 1), (0, 1), lambda x, y: 0.0)


@pytest.mark.skipif(not os.path.exists(CKPT), reason="checkpoint not present")
def test_trained_policy_walks_on_mesh_terrain(tmp_path):
    from tds_tpu.envs.laikago import LaikagoEnv
    from tds_tpu.learn.nn import linear_policy
    from tds_tpu.learn.running_stat import RunningStat
    from tds_tpu.utils.checkpoint import load_checkpoint

    path = write_heightfield(
        str(tmp_path / "terrain.obj"), 13, 7, (-1.0, 5.0), (-1.5, 1.5),
        lambda x, y: 0.02 * math.sin(math.pi * x) * math.cos(math.pi * y),
    )
    terrain = Mesh(file_name=path, max_contacts=3)

    saved, _ = load_checkpoint(CKPT)
    params = jnp.asarray(saved["params"], jnp.float32)
    obs_stat = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), saved["obs_stat"]
    )
    if not isinstance(obs_stat, RunningStat):
        obs_stat = RunningStat(*obs_stat)

    env = LaikagoEnv(dtype=jnp.float32, terrain=terrain)
    policy = linear_policy(env.observation_dim, env.action_dim)

    @jax.jit
    def rollout(key):
        st, obs = env.reset(key)

        def step(carry, _):
            st, obs, alive = carry
            action = env.action_transform(
                policy.apply(params, obs_stat.normalize(obs))
            )
            st2, obs2, _, done = env.step(st, action)
            alive = alive * (1.0 - done.astype(jnp.float32))
            return (st2, obs2, alive), None

        (st, obs, alive), _ = jax.lax.scan(
            step, (st, obs, 1.0), None, length=1500
        )
        return st.q, alive

    q, alive = rollout(jax.random.PRNGKey(0))
    q = np.asarray(q)
    assert np.all(np.isfinite(q))
    assert float(alive) == 1.0, "policy fell on terrain within 1500 steps"
    # commit-time actual: x = 1.79 m in 1.5 s (flat-ground gait ~1.6 m/s)
    assert q[0] > 1.0, f"gait too slow on terrain: x={q[0]:.3f} m in 1.5 s"
    assert 0.3 < q[2] < 0.6, f"bad height on terrain: z={q[2]:.3f}"


def test_height_scan_observations(tmp_path):
    # exteroception: vertical rays sample the terrain under egocentric
    # scan points and join the observation, relative to base height
    from tds_tpu.envs.laikago import LaikagoEnv

    def h(x, y):
        return 0.05 * math.sin(2.0 * x) + 0.02 * y

    path = write_heightfield(
        str(tmp_path / "scan_terrain.obj"), 25, 25, (-2.0, 2.0), (-2.0, 2.0), h
    )
    terrain = Mesh(file_name=path, max_contacts=3)
    scan = [(0.0, 0.0), (0.3, 0.0), (0.0, 0.2), (-0.3, -0.2)]
    env = LaikagoEnv(dtype=jnp.float32, terrain=terrain, height_scan=scan)
    plain = LaikagoEnv(dtype=jnp.float32, terrain=terrain)
    assert env.observation_dim == plain.observation_dim + len(scan)

    q, qd = env.initial_state(jax.random.PRNGKey(0))
    obs = env.observation(q, qd)
    assert obs.shape == (env.observation_dim,)
    heights = np.asarray(obs[-len(scan):])
    base = np.asarray(q[0:3])
    # piecewise-linear mesh interpolates the smooth h(x,y): loose tol for
    # the 0.167-m grid, tight where scan points coincide with h's scale
    for (ox, oy), got in zip(scan, heights):
        expected = h(base[0] + ox, base[1] + oy) - base[2]
        assert abs(got - expected) < 5e-3, (ox, oy, got, expected)

    # yaw rotation: after a 90deg yaw, the (0.3, 0) scan point samples
    # the terrain at +y instead of +x
    q_yaw = q.at[5].set(np.pi / 2)
    obs_yaw = env.observation(q_yaw, qd)
    h_yaw = np.asarray(obs_yaw[-len(scan):])
    expected_front = h(base[0], base[1] + 0.3) - base[2]
    assert abs(h_yaw[1] - expected_front) < 5e-3

    # the scan jits and vmaps
    f = jax.jit(jax.vmap(env.observation))
    qs = jnp.tile(q[None], (3, 1))
    qds = jnp.tile(qd[None], (3, 1))
    out = f(qs, qds)
    assert out.shape == (3, env.observation_dim)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(obs), atol=1e-5)

    # height_scan without terrain is an error
    with pytest.raises(ValueError):
        LaikagoEnv(dtype=jnp.float32, height_scan=scan)


def test_ars_train_step_on_terrain():
    """The full ARS training iteration (rollouts -> g_hat update) compiles
    and runs through Heightfield terrain contact WITH height-scan
    observations — the terrain-training entry point of
    examples/laikago_ars_train.py (--terrain_bump/--terrain_scan)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.laikago_ars_train import make_terrain_env
    from tds_tpu.learn.ars import ARSConfig, init_ars, make_train_step
    from tds_tpu.learn.nn import linear_policy

    env = make_terrain_env(bump=0.02, scan_points=9, dtype=jnp.float32)
    plain = make_terrain_env(bump=0.02, scan_points=0, dtype=jnp.float32)
    assert env.observation_dim == plain.observation_dim + 9
    policy = linear_policy(env.observation_dim, env.action_dim)
    cfg = ARSConfig(num_directions=2, rollout_length=8, eval_interval=100)
    state = init_ars(env, policy, jax.random.PRNGKey(0))
    step_fn = make_train_step(env, policy, cfg)

    state2, metrics = step_fn(state)
    assert int(state2.total_timesteps) > 0
    assert np.isfinite(float(metrics["reward_pos_mean"]))
    # the update touched the params (terrain rewards are nonzero)
    assert np.isfinite(np.asarray(state2.params)).all()
    # obs filter saw the scan dims: its mean over the scan slice is the
    # (negative) base height above terrain, far from the init zeros
    scan_mean = np.asarray(state2.obs_stat.mean[-9:])
    assert np.all(np.abs(scan_mean) > 0.05), scan_mean
