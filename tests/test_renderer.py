"""Software renderer tests."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from tds_tpu.model.geometry import GeomAttachment, Sphere
from tds_tpu.model.multibody import MultiBodyBuilder
from tds_tpu.visualizer.renderer import (
    Camera,
    Instance,
    box_mesh,
    render_scene,
    save_png,
    scene_instances_from_world,
    sphere_mesh,
)
from tds_tpu.world import build_world, make_ground_plane


def test_meshes():
    v, f = sphere_mesh(0.5)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1).max(), 0.5, atol=1e-9)
    v, f = box_mesh((1.0, 2.0, 3.0))
    assert v.shape == (8, 3) and f.shape == (12, 3)


def test_render_sphere_on_plane():
    b = MultiBodyBuilder(is_floating=True, name="ball")
    b.set_base_inertia(1.0, (0, 0, 0), np.diag([0.1] * 3))
    ball = b.finalize()
    world = build_world(
        [make_ground_plane(), (ball, (GeomAttachment(-1, Sphere(0.5)),))]
    )
    q = ball.zero_q().at[6].set(0.5)
    inst = scene_instances_from_world(world, (jnp.zeros(0), q))
    cam = Camera.look_at(eye=(2.5, -2.0, 1.4), target=(0, 0, 0.4),
                         width=160, height=120)
    img = render_scene(cam, inst)
    assert img.shape == (120, 160, 3)
    # sphere visible at the center, background in the top corner
    assert not np.array_equal(img[60, 80], img[2, 2])
    # depth correct: sphere occludes the plane behind it
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 10
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.png")
        save_png(img, path)
        with open(path, "rb") as f:
            assert f.read(8) == b"\x89PNG\r\n\x1a\n"
