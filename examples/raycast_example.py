#!/usr/bin/env python
"""Batched raycasting against spheres, boxes and a ground plane.

The tds_tpu analog of the reference's python/examples/g_raycast.py — but
instead of casting rays one by one, a whole image-plane grid of rays is
cast in a single jitted call (the TPU-native shape of the same feature).

Run: PYTHONPATH=. python examples/raycast_example.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from tds_tpu.algebra.transform import Transform
from tds_tpu.collision.raycast import cast_rays
from tds_tpu.model.geometry import Box, Plane, Sphere


def main():
    shapes = [
        Sphere(radius=0.5),
        Box(extents=(0.8, 0.8, 0.8)),
        Plane(normal=(0.0, 0.0, 1.0), constant=0.0),
    ]
    transforms = [
        Transform.from_pos(jnp.array([-0.8, 0.0, 0.5])),
        Transform.from_pos(jnp.array([0.8, 0.0, 0.4])),
        Transform.identity(),
    ]

    # a 32x32 grid of downward-angled rays from a virtual camera
    n = 32
    xs = jnp.linspace(-2.0, 2.0, n)
    ys = jnp.linspace(-2.0, 2.0, n)
    gx, gy = jnp.meshgrid(xs, ys)
    origins = jnp.stack([gx, gy, jnp.full_like(gx, 3.0)], axis=-1)
    targets = jnp.stack([gx, gy, jnp.full_like(gx, -1.0)], axis=-1)

    hits = jax.jit(lambda o, t: cast_rays(o, t, shapes, transforms))(
        origins.reshape(-1, 3), targets.reshape(-1, 3)
    )
    frac = hits.fraction.reshape(n, n)
    obj = hits.geom_index.reshape(n, n)

    print("hit objects (.' = plane, o = sphere, # = box):")
    glyphs = {0: "o", 1: "#", 2: "."}
    for row in range(0, n, 2):
        print("".join(glyphs.get(int(obj[row, col]), " ") for col in range(n)))
    print(f"closest fraction: {float(frac.min()):.3f} "
          f"(sphere top at z={float(3.0 - 4.0 * frac.min()):.3f})")


if __name__ == "__main__":
    main()
