"""Heightfield terrain meshes (beyond reference: TDS has no terrain
support — its locomotion worlds are infinite planes, world.hpp:29-68).

Generates a triangulated grid OBJ from a height function; pair it with
``Mesh(max_contacts=K)`` and the triangle-accurate ``sphere_mesh``
narrowphase to walk robots over uneven ground
(``LocomotionEnv(terrain=...)``). The mesh is a trace-time constant, so
terrain costs one (V,3) transform + a (T,) closest-point sweep per toe —
statically shaped, vmap/shard friendly.
"""

from typing import Callable, Tuple


def heightfield_obj(
    nx: int,
    ny: int,
    x_range: Tuple[float, float],
    y_range: Tuple[float, float],
    height_fn: Callable[[float, float], float],
) -> str:
    """OBJ text for an (nx x ny)-vertex grid with z = height_fn(x, y).

    2*(nx-1)*(ny-1) triangles; vertices row-major in x."""
    if nx < 2 or ny < 2:
        raise ValueError("need at least a 2x2 vertex grid")
    x0, x1 = x_range
    y0, y1 = y_range
    lines = []
    for j in range(ny):
        y = y0 + (y1 - y0) * j / (ny - 1)
        for i in range(nx):
            x = x0 + (x1 - x0) * i / (nx - 1)
            lines.append(f"v {x:.9g} {y:.9g} {float(height_fn(x, y)):.9g}")
    for j in range(ny - 1):
        for i in range(nx - 1):
            a = j * nx + i + 1  # OBJ indices are 1-based
            b = a + 1
            c = a + nx
            d = c + 1
            lines.append(f"f {a} {b} {d}")
            lines.append(f"f {a} {d} {c}")
    return "\n".join(lines) + "\n"


def write_heightfield(path: str, *args, **kwargs) -> str:
    """Write ``heightfield_obj(*args, **kwargs)`` to ``path``; returns path."""
    with open(path, "w") as f:
        f.write(heightfield_obj(*args, **kwargs))
    return path


def make_heightfield(
    nx: int,
    ny: int,
    x_range: Tuple[float, float],
    y_range: Tuple[float, float],
    height_fn: Callable[[float, float], float],
    max_contacts: int = 1,
):
    """The analytic ``Heightfield`` shape over the SAME grid/triangulation
    as ``heightfield_obj`` — identical contact surface, O(1) queries."""
    from tds_tpu.model.geometry import Heightfield

    x0, x1 = x_range
    y0, y1 = y_range
    heights = tuple(
        float(height_fn(x0 + (x1 - x0) * i / (nx - 1),
                        y0 + (y1 - y0) * j / (ny - 1)))
        for j in range(ny)
        for i in range(nx)
    )
    return Heightfield(
        nx=nx, ny=ny, x_range=tuple(x_range), y_range=tuple(y_range),
        heights=heights, max_contacts=max_contacts,
    )
