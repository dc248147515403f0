#!/usr/bin/env python
"""Render the laikago standing pose to a PNG with the software renderer.

Run: PYTHONPATH=. python examples/render_laikago.py [out.png]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from tds_tpu.envs.laikago import LaikagoEnv
from tds_tpu.visualizer.renderer import (
    Camera,
    plane_mesh,
    Instance,
    render_scene,
    save_png,
    scene_instances_from_urdf,
)


def main():
    import os
    import numpy as np

    out = sys.argv[1] if len(sys.argv) > 1 else "laikago.png"
    env = LaikagoEnv(settle_steps=10)
    state, _ = env.reset(jax.random.PRNGKey(0))

    from tds_tpu.urdf.cache import load_document
    from tds_tpu.utils.file_utils import find_file

    urdf_name = "laikago/laikago_toes_zup_xyz_xyzrot.urdf"
    urdf = load_document(urdf_name)
    urdf_dir = os.path.dirname(find_file(urdf_name))
    instances = scene_instances_from_urdf(urdf, env.model, state.q, urdf_dir)
    pv, pf = plane_mesh()
    instances.append(
        Instance(pv, pf, np.zeros(3), np.eye(3), (0.5, 0.5, 0.55))
    )
    cam = Camera.look_at(
        eye=(1.4, -1.2, 0.9), target=(0.0, 0.0, 0.3), width=640, height=480
    )
    img = render_scene(cam, instances)
    save_png(img, out)
    print(f"wrote {out} ({img.shape[1]}x{img.shape[0]})")


if __name__ == "__main__":
    main()
