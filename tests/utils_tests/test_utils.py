"""Real-fixture IO tests (reference: tests/utils_tests/test_utils.py:7-28 uses a
shipped teapot.obj). The fixture here is an irregular teapot-class mesh: n-gon
faces (quads + pentagons strip-triangulated), ``f v/vt/vn`` and ``f v//vn``
syntax, comments, blank lines and double-space runs — the cases a real-world
OBJ throws at a parser. The native C fast path (csrc/fastio.c) and the pure
Python fallback must produce byte-identical arrays.
"""
import os

import numpy as np

from meshrcnn_tpu.data import serialization as ser
from meshrcnn_tpu.data.serialization import load_mesh, load_voxels, save_mesh, save_voxels

FIXTURE = os.path.join(os.path.dirname(__file__), "teapot.obj")


def _parse_with_python_fallback(path):
    saved = ser._fastio
    ser._fastio = None
    try:
        return load_mesh(path)
    finally:
        ser._fastio = saved


def test_teapot_fixture_shapes():
    mesh = load_mesh(FIXTURE)
    # 26 vertices; 8 quads -> 16 tris, 4 pentagons -> 12 tris, 2 tris = 30
    assert mesh.vertices.shape == (26, 3)
    assert mesh.faces.shape == (30, 3)
    assert mesh.faces.min() == 0 and mesh.faces.max() == 25
    # the double-space vertex parsed correctly
    assert np.allclose(mesh.vertices[-1], [1.9, 0.1, 0.5])


def test_c_parser_matches_python_fallback():
    py = _parse_with_python_fallback(FIXTURE)
    if ser._fastio is None:
        import pytest
        pytest.skip("C fastio extension unavailable")
    c = load_mesh(FIXTURE)
    assert np.array_equal(py.vertices, c.vertices)
    assert np.array_equal(py.faces, c.faces)
    assert py.vertices.dtype == c.vertices.dtype == np.float32
    assert py.faces.dtype == c.faces.dtype


def test_teapot_roundtrip(tmp_path):
    mesh = load_mesh(FIXTURE)
    out = str(tmp_path / "teapot_rt")
    save_mesh(mesh.vertices, mesh.faces, out)
    back = load_mesh(out + ".obj")
    assert np.allclose(back.vertices, mesh.vertices, atol=1e-4)
    assert np.array_equal(back.faces, mesh.faces)


def test_voxel_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    grid = (rng.rand(16, 16, 16) > 0.6).astype(np.float32)
    path = str(tmp_path / "vox.npy")
    save_voxels(grid, path)
    back = load_voxels(path)
    assert np.array_equal(back.astype(bool), grid.astype(bool))


def test_show_renderers_headless(tmp_path):
    """show_mesh / show_voxels / show_mesh_pointCloud render the teapot fixture
    headlessly, accepting a path, a (verts, faces) pair, and padded+mask input
    (reference: utils/show.py:23-84 semantics incl. alpha rotation)."""
    import matplotlib
    matplotlib.use("Agg")
    import numpy as np
    from meshrcnn_tpu.utils.rotation import rotation
    from meshrcnn_tpu.utils.show import (show_mesh, show_mesh_pointCloud,
                                         show_voxels)

    # rotation golden: 90 deg about x maps (0,1,0) -> (0,0,1)
    np.testing.assert_allclose(rotation(90.0) @ np.array([0, 1, 0.0]),
                               [0, 0, 1], atol=1e-6)

    teapot = os.path.join(os.path.dirname(__file__), "teapot.obj")
    fig = show_mesh(teapot, alpha=90, show=False)
    assert fig is not None

    m = load_mesh(teapot)
    fig = show_mesh_pointCloud((m.vertices, m.faces), num_points=64, show=False)
    assert fig is not None
    # raw point-array input path
    fig = show_mesh_pointCloud(np.asarray(m.vertices), show=False)
    assert fig is not None

    # padded + masked input
    v = np.zeros((len(m.vertices) + 5, 3), np.float32)
    v[:len(m.vertices)] = m.vertices
    vm = np.zeros(len(v), bool); vm[:len(m.vertices)] = True
    f = np.zeros((len(m.faces) + 7, 3), np.int32)
    f[:len(m.faces)] = m.faces
    fm = np.zeros(len(f), bool); fm[:len(m.faces)] = True
    fig = show_mesh(v, f, vm, fm, show=False)
    assert fig is not None

    fig = show_voxels(np.random.rand(6, 6, 6), threshold=0.5, show=False)
    assert fig is not None
