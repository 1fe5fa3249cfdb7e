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
