"""Analytic Heightfield shape vs the triangulated Mesh oracle.

Heightfield's contact surface is DEFINED as identical to the Mesh that
utils.terrain.heightfield_obj builds on the same grid; these tests pin
that equivalence — same contacts, same heights, same trajectories — while
the heightfield's cost is O(1) per query instead of O(T)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tds_tpu.algebra.transform import Transform
from tds_tpu.collision import narrowphase
from tds_tpu.model.geometry import Heightfield, Mesh, Sphere
from tds_tpu.utils.terrain import make_heightfield, write_heightfield

NX, NY = 9, 7
XR, YR = (-1.0, 3.0), (-1.5, 1.5)


def h_fn(x, y):
    return 0.08 * math.sin(2.0 * x) * math.cos(1.5 * y) + 0.03 * y


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("hf") / "terrain.obj")
    write_heightfield(path, NX, NY, XR, YR, h_fn)
    mesh = Mesh(file_name=path, max_contacts=2)
    hf = make_heightfield(NX, NY, XR, YR, h_fn, max_contacts=2)
    return hf, mesh


def _x(pos, dtype=jnp.float64):
    return Transform(pos=jnp.asarray(pos, dtype), rot=jnp.eye(3, dtype=dtype))


def test_heightfield_validates():
    with pytest.raises(ValueError):
        Heightfield(1, 2, (0, 1), (0, 1), (0.0, 0.0))
    with pytest.raises(ValueError):
        Heightfield(2, 2, (0, 1), (0, 1), (0.0, 0.0, 0.0))
    assert not narrowphase.supported(
        Sphere(0.1),
        Heightfield(2, 2, (0, 1), (0, 1), (0.0,) * 4, max_contacts=0),
    )


def test_sphere_heightfield_matches_mesh_oracle(pair):
    hf, mesh = pair
    rng = np.random.default_rng(0)
    n = 200
    # centers over the interior of the grid, near the surface
    xs = rng.uniform(XR[0] + 0.3, XR[1] - 0.3, n)
    ys = rng.uniform(YR[0] + 0.3, YR[1] - 0.3, n)
    zs = np.array([h_fn(x, y) for x, y in zip(xs, ys)]) + rng.uniform(
        -0.01, 0.15, n
    )
    centers = jnp.asarray(np.stack([xs, ys, zs], axis=-1))
    sphere = Sphere(0.04)  # radius << 0.5 m cell size

    def both(c):
        x = Transform(pos=c, rot=jnp.eye(3, dtype=c.dtype))
        a = narrowphase.compute_contacts(sphere, x, hf, _x((0, 0, 0)))
        b = narrowphase.compute_contacts(sphere, x, mesh, _x((0, 0, 0)))
        return a, b

    a, b = jax.vmap(both)(centers)
    np.testing.assert_allclose(
        np.asarray(a.distance), np.asarray(b.distance), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(a.point_b), np.asarray(b.point_b), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(a.normal_on_b), np.asarray(b.normal_on_b), atol=1e-10
    )


def test_heightfield_height_matches_mesh_rays(pair):
    hf, mesh = pair
    from tds_tpu.collision.narrowphase import heightfield_height
    from tds_tpu.collision.raycast import ray_mesh

    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.uniform(XR[0], XR[1], 64))
    ys = jnp.asarray(rng.uniform(YR[0], YR[1], 64))
    h_direct = heightfield_height(hf, xs, ys)
    origins = jnp.stack([xs, ys, jnp.full_like(xs, 10.0)], axis=-1)
    targets = origins.at[:, 2].add(-20.0)
    frac, _ = ray_mesh(origins, targets, mesh, _x((0, 0, 0)))
    h_ray = 10.0 - frac * 20.0
    np.testing.assert_allclose(
        np.asarray(h_direct), np.asarray(h_ray), atol=1e-12
    )


def test_laikago_trajectory_identical_on_heightfield_and_mesh(pair):
    hf, mesh = pair
    from tds_tpu.envs.laikago import LaikagoEnv

    hf3 = make_heightfield(NX, NY, XR, YR, h_fn, max_contacts=3)
    mesh3 = Mesh(file_name=mesh.file_name, max_contacts=3)
    env_h = LaikagoEnv(dtype=jnp.float32, terrain=hf3,
                       height_scan=[(0.0, 0.0), (0.25, 0.0)])
    env_m = LaikagoEnv(dtype=jnp.float32, terrain=mesh3,
                       height_scan=[(0.0, 0.0), (0.25, 0.0)])
    assert env_h.observation_dim == env_m.observation_dim

    def rollout(env):
        q, qd = env.initial_state(jax.random.PRNGKey(0))
        zero = jnp.zeros((env.action_dim,), jnp.float32)

        def step(carry, _):
            q, qd = carry
            return env.sim_step(q, qd, zero), None

        (q, qd), _ = jax.lax.scan(step, (q, qd), None, length=300)
        return q, qd, env.observation(q, qd)

    qh, qdh, oh = jax.jit(lambda: rollout(env_h))()
    qm, qdm, om = jax.jit(lambda: rollout(env_m))()
    np.testing.assert_allclose(np.asarray(qh), np.asarray(qm), atol=1e-5)
    np.testing.assert_allclose(np.asarray(qdh), np.asarray(qdm), atol=1e-4)
    np.testing.assert_allclose(np.asarray(oh), np.asarray(om), atol=1e-4)
    assert np.all(np.isfinite(np.asarray(qh)))
