"""Native mesh runtime tests: OBJ parsing, mass properties, marching tets."""

import numpy as np
import pytest

from tds_tpu.native import mesh as nm

CUBE_OBJ = """
v -0.5 -0.5 -0.5
v  0.5 -0.5 -0.5
v  0.5  0.5 -0.5
v -0.5  0.5 -0.5
v -0.5 -0.5  0.5
v  0.5 -0.5  0.5
v  0.5  0.5  0.5
v -0.5  0.5  0.5
f 1 4 3 2
f 5 6 7 8
f 1 2 6 5
f 2 3 7 6
f 3 4 8 7
f 4 1 5 8
"""


@pytest.fixture(scope="module")
def lib():
    lib = nm.get_lib()
    if lib is None:
        pytest.skip("native lib failed to build")
    return lib


def test_obj_parse(lib):
    verts, tris = nm.load_obj(CUBE_OBJ)
    assert verts.shape == (8, 3)
    assert tris.shape == (12, 3)  # 6 quads fan to 12 triangles
    np.testing.assert_allclose(verts.min(0), [-0.5] * 3)
    np.testing.assert_allclose(verts.max(0), [0.5] * 3)


def test_cube_mass_properties(lib):
    verts, tris = nm.load_obj(CUBE_OBJ)
    mass, com, inertia = nm.mesh_mass_properties(verts, tris, density=2.0)
    # unit cube, density 2 -> mass 2, com 0, I = m/6 * eye for a cube
    np.testing.assert_allclose(mass, 2.0, rtol=1e-12)
    np.testing.assert_allclose(com, [0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(inertia, (2.0 / 6.0) * np.eye(3), atol=1e-10)


def test_shifted_cube_com(lib):
    verts, tris = nm.load_obj(CUBE_OBJ)
    verts = verts + np.array([1.0, 2.0, 3.0])
    mass, com, inertia = nm.mesh_mass_properties(verts, tris, density=1.0)
    np.testing.assert_allclose(mass, 1.0, rtol=1e-12)
    np.testing.assert_allclose(com, [1, 2, 3], rtol=1e-12)
    # inertia about COM unchanged by translation
    np.testing.assert_allclose(inertia, (1.0 / 6.0) * np.eye(3), atol=1e-9)


def test_marching_tets_sphere(lib):
    n = 40
    xs = np.linspace(-1.2, 1.2, n)
    zz, yy, xx = np.meshgrid(xs, xs, xs, indexing="ij")
    sdf = np.sqrt(xx**2 + yy**2 + zz**2) - 1.0
    tris = nm.marching_cubes(sdf, origin=(-1.2, -1.2, -1.2), dx=xs[1] - xs[0])
    assert len(tris) > 1000
    # every emitted vertex lies near the unit sphere
    r = np.linalg.norm(tris.reshape(-1, 3), axis=-1)
    assert abs(float(r.mean()) - 1.0) < 0.01
    assert float(np.abs(r - 1.0).max()) < 0.06


def test_laikago_mesh_loads(lib):
    import os

    from tds_tpu.utils.file_utils import find_file

    try:
        path = find_file("laikago/chassis_zup.obj")
    except FileNotFoundError:
        pytest.skip("laikago mesh asset not found")
    verts, tris = nm.load_obj_file(path)
    assert len(verts) > 100 and len(tris) > 100
    assert np.all(tris < len(verts))
