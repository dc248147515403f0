"""Raycast, checkpoint, profiling utility tests."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from tds_tpu.algebra.transform import Transform
from tds_tpu.collision.raycast import cast_rays, ray_plane, ray_sphere
from tds_tpu.model.geometry import Box, Plane, Sphere
from tds_tpu.utils.checkpoint import (
    load_checkpoint,
    load_policy_weights,
    save_checkpoint,
    save_policy_weights,
)
from tds_tpu.utils.profiling import ChromeTracer


def xf(pos):
    pos = jnp.asarray(pos, dtype=jnp.float64)
    return Transform(pos=pos, rot=jnp.eye(3, dtype=jnp.float64))


def test_ray_sphere_hit_and_miss():
    t = ray_sphere(jnp.array([0.0, 0, 0]), jnp.array([10.0, 0, 0]),
                   jnp.array([5.0, 0, 0]), 1.0)
    np.testing.assert_allclose(float(t), 0.4, atol=1e-12)  # hits at x=4
    t2 = ray_sphere(jnp.array([0.0, 0, 0]), jnp.array([10.0, 0, 0]),
                    jnp.array([5.0, 3.0, 0]), 1.0)
    assert float(t2) > 1e20


def test_cast_rays_closest():
    shapes = [Sphere(1.0), Plane((0, 0, 1.0), 0.0), Box((2.0, 2.0, 2.0))]
    tfs = [xf([5, 0, 0]), xf([0, 0, 0]), xf([8, 0, 0])]
    origins = jnp.array([[0.0, 0, 0.5], [0.0, 0, 2.0]])
    targets = jnp.array([[10.0, 0, 0.5], [0.0, 0, -2.0]])
    hit = cast_rays(origins, targets, shapes, tfs)
    assert int(hit.geom_index[0]) == 0  # sphere first along +x
    assert int(hit.geom_index[1]) == 1  # straight down to the plane
    np.testing.assert_allclose(float(hit.fraction[1]), 0.5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(hit.normal[1]), [0, 0, 1], atol=1e-12)
    # batched jit + vmap
    f = jax.jit(lambda o, t: cast_rays(o, t, shapes, tfs).fraction)
    np.testing.assert_allclose(f(origins, targets), hit.fraction, atol=1e-12)


def test_checkpoint_roundtrip():
    state = {
        "params": jnp.arange(5.0),
        "nested": {"key": jax.random.PRNGKey(7), "count": 3},
    }
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.pkl")
        save_checkpoint(path, state, metadata={"iteration": 12})
        loaded, meta = load_checkpoint(path)
        np.testing.assert_allclose(loaded["params"], state["params"])
        np.testing.assert_array_equal(loaded["nested"]["key"], state["nested"]["key"])
        assert meta["iteration"] == 12

        wpath = os.path.join(d, "laikago_weights_101.bin")
        save_policy_weights(wpath, jnp.array([1.5, -2.5]), reward=101.0)
        np.testing.assert_allclose(load_policy_weights(wpath), [1.5, -2.5])


def test_chrome_tracer():
    tracer = ChromeTracer()
    with tracer.zone("physics"):
        with tracer.zone("contacts"):
            pass
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "trace.json")
        tracer.write(path)
        import json

        events = json.load(open(path))["traceEvents"]
        assert {e["name"] for e in events} == {"physics", "contacts"}
