"""Collision geometry descriptors (static) + local inertia helpers.

Shapes mirror the reference's geometry.hpp:30-342 (sphere, plane, capsule,
box, cylinder; mesh is a type id only). Descriptors are hashable plain
Python (trace-time constants); the collision module turns static
(geomA, geomB) pairs into fixed-size jnp contact computations.
"""

import dataclasses
import math
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class Sphere:
    radius: float

    def local_inertia(self, mass: float):
        e = 0.4 * mass * self.radius**2
        return (e, e, e)


@dataclasses.dataclass(frozen=True)
class Plane:
    """Infinite plane n.x = constant (reference geometry.hpp:155)."""

    normal: Tuple[float, float, float] = (0.0, 0.0, 1.0)
    constant: float = 0.0

    def local_inertia(self, mass: float):
        return (0.0, 0.0, 0.0)


@dataclasses.dataclass(frozen=True)
class Capsule:
    """Capsule along local Z with cylindrical section ``length``
    (reference geometry.hpp:104)."""

    radius: float
    length: float

    def local_inertia(self, mass: float):
        # reference geometry.hpp:120-151: cylinder + hemispherical end caps
        r, l = self.radius, self.length
        lx = lz = r
        ly = 0.5 * l
        vol_cyl = math.pi * r * r * l
        vol_sph = (4.0 / 3.0) * math.pi * r**3
        total = vol_cyl + vol_sph
        m_cyl = mass * vol_cyl / total
        m_sph = mass * vol_sph / total
        # cylinder about its center, axis z
        ixx_cyl = m_cyl * (l * l / 12.0 + r * r / 4.0)
        izz_cyl = m_cyl * r * r / 2.0
        # sphere split into two hemispheres at the ends
        i_sph = 0.4 * m_sph * r * r
        d = 0.5 * l
        ixx = ixx_cyl + i_sph + m_sph * d * d
        izz = izz_cyl + i_sph
        return (ixx, ixx, izz)


@dataclasses.dataclass(frozen=True)
class Box:
    """Axis-aligned box with full extents (reference geometry.hpp:193)."""

    extents: Tuple[float, float, float]

    def local_inertia(self, mass: float):
        x, y, z = self.extents
        k = mass / 12.0
        return (k * (y * y + z * z), k * (x * x + z * z), k * (x * x + y * y))


@dataclasses.dataclass(frozen=True)
class Cylinder:
    radius: float
    length: float

    def local_inertia(self, mass: float):
        r, l = self.radius, self.length
        ixx = mass * (3 * r * r + l * l) / 12.0
        return (ixx, ixx, 0.5 * mass * r * r)


@dataclasses.dataclass(frozen=True)
class Mesh:
    """Triangle-mesh shape (the reference's geometry.hpp stops at a type id
    with no mesh narrowphase; we go further, opt-in).

    ``max_contacts = 0`` (the default) keeps reference parity: the mesh is
    visual-only and every collision pair involving it is unsupported, so
    existing models are bit-for-bit unaffected. Setting ``max_contacts = K``
    (e.g. ``dataclasses.replace(mesh, max_contacts=4)``) enables the
    vertex-based narrowphase in ``collision/narrowphase.py``: the K deepest
    mesh vertices become the static contact-candidate set — the same
    fixed-count + masking design as the reference's 8-corner box probes
    (contact_point.hpp:164-198), sized for the TPU's static shapes."""

    file_name: str = ""
    scale: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    max_contacts: int = 0
    # mesh-vs-mesh only: additionally emit this many edge-edge candidates
    # per direction (closest points between edge pairs probed into the
    # other surface). Vertex sampling alone misses crossing-edge contacts
    # (two cubes meeting edge-on-edge); this opt-in closes that. Both
    # meshes of a pair must set it (cost is O(E_a*E_b), meant for small
    # convex-ish meshes — terrain-scale surfaces should use Heightfield).
    edge_contacts: int = 0

    def local_inertia(self, mass: float):
        """Principal-diagonal inertia of the SOLID mesh scaled to ``mass``
        via the native signed-tetrahedron decomposition (beyond reference:
        TDS returns nothing for meshes). Falls back to zeros if the file
        is missing so visual-only meshes stay harmless."""
        try:
            from tds_tpu.collision.narrowphase import _mesh_data
            from tds_tpu.native.mesh import mesh_mass_properties

            verts, tris = _mesh_data(self.file_name, self.scale)
            m0, _, inertia = mesh_mass_properties(verts, tris, density=1.0)
            if m0 <= 0.0:
                return (0.0, 0.0, 0.0)
            s = mass / m0
            return (
                float(inertia[0, 0] * s),
                float(inertia[1, 1] * s),
                float(inertia[2, 2] * s),
            )
        except (OSError, ValueError):
            return (0.0, 0.0, 0.0)


@dataclasses.dataclass(frozen=True)
class Heightfield:
    """Axis-aligned triangulated height grid (beyond reference: TDS has no
    terrain shape at all).

    Semantically identical to the Mesh produced by
    ``utils.terrain.heightfield_obj`` on the same grid — each cell is the
    same two triangles — but narrowphase cost is O(1) per query (a 3x3
    cell neighborhood lookup) instead of O(T) over every triangle, so
    large terrains stay cheap. ``heights`` is row-major in x with
    ``len == nx * ny``; exact for sphere contacts whose closest feature
    lies within one cell of the center's cell (radius < cell size)."""

    nx: int
    ny: int
    x_range: Tuple[float, float]
    y_range: Tuple[float, float]
    heights: Tuple[float, ...]
    max_contacts: int = 1

    def __post_init__(self):
        if self.nx < 2 or self.ny < 2:
            raise ValueError("need at least a 2x2 vertex grid")
        if len(self.heights) != self.nx * self.ny:
            raise ValueError(
                f"heights has {len(self.heights)} entries, "
                f"expected nx*ny = {self.nx * self.ny}"
            )

    def local_inertia(self, mass: float):
        return (0.0, 0.0, 0.0)  # terrain is static


@dataclasses.dataclass(frozen=True)
class GeomAttachment:
    """A collision shape attached to a link (or the base, link_index=-1)."""

    link_index: int
    shape: object  # one of the dataclasses above
    # offset transform of the shape in the link frame
    pos: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    rpy: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    # contact material (reference urdf_structures.hpp UrdfContact)
    friction: float = 0.5
    restitution: float = 0.0
