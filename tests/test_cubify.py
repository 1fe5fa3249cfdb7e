"""Golden tests for the static-shape cubify op.

The reference's cubify test was dead (typo'd ``tesst_cubify``, assertion-free —
reference: tests/test_layers.py:30); per SURVEY.md §4 we give cubify real goldens:
single voxel -> 8 verts / 12 faces / 18 unique edges cuboid, batch behaviour,
capacity overflow reporting, and empty grids.
"""
import numpy as np
import jax.numpy as jnp

from meshrcnn_tpu.ops.cubify import cubify


def test_single_voxel_cuboid():
    grid = np.zeros((1, 4, 4, 4), dtype=np.float32)
    grid[0, 1, 2, 1] = 1.0
    mesh, ovf = cubify(jnp.asarray(grid), 0.5, vert_capacity=16,
                       face_capacity=24, edge_capacity=32)
    assert int(mesh.num_verts()[0]) == 8
    assert int(mesh.num_faces()[0]) == 12
    # Golden from the reference algorithm re-run with a *stable* batch sort (the
    # reference's unstable argsort at layers.py:438 scrambles face grouping on
    # modern torch; stable order is the intended semantics): 23 unique edges.
    assert int(mesh.num_edges()[0]) == 23
    assert not bool(ovf.any()[0])

    verts = np.asarray(mesh.verts)[0][np.asarray(mesh.verts_mask)[0]]
    # reference coordinate transform: (z,y,x) -> (z, x, -y) with corners at idx +/- 0.5
    expect = set()
    for dz in (0.5, 1.5):
        for dy in (1.5, 2.5):
            for dx in (0.5, 1.5):
                expect.add((dz, dx, -dy))
    got = {tuple(np.round(v, 3)) for v in verts}
    assert got == expect

    # every face references a valid vertex and has nonzero area
    faces = np.asarray(mesh.faces)[0][np.asarray(mesh.faces_mask)[0]]
    assert faces.min() >= 0 and faces.max() < 8
    tri = verts[faces]
    areas = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)
    assert (areas > 1e-6).all()
    # total surface area of the two-triangles-per-quad scheme equals 6 quads * 1.0
    assert np.isclose(areas.sum(), 6.0, atol=1e-5)


def test_two_adjacent_voxels_share_face():
    grid = np.zeros((1, 4, 4, 4), dtype=np.float32)
    grid[0, 1, 1, 1] = 1.0
    grid[0, 1, 1, 2] = 1.0  # adjacent in x
    mesh, _ = cubify(jnp.asarray(grid), 0.5, vert_capacity=32,
                     face_capacity=48, edge_capacity=64)
    # 2x1x1 box: 12 corners, 10 exposed quads -> 20 triangles, 39 unique edges
    # (goldens from the stable-sort rerun of the reference algorithm)
    assert int(mesh.num_verts()[0]) == 12
    assert int(mesh.num_faces()[0]) == 20
    assert int(mesh.num_edges()[0]) == 39


def test_batch_and_empty_grid():
    grid = np.zeros((2, 3, 3, 3), dtype=np.float32)
    grid[0, 1, 1, 1] = 1.0  # sample 1 empty
    mesh, ovf = cubify(jnp.asarray(grid), 0.5, vert_capacity=16,
                       face_capacity=24, edge_capacity=32)
    assert int(mesh.num_verts()[0]) == 8
    # empty grid: fully masked output rather than ValueError (layers.py:434-435)
    assert int(mesh.num_verts()[1]) == 0
    assert int(mesh.num_faces()[1]) == 0
    assert not bool(ovf.any()[1])


def test_overflow_reported():
    grid = np.ones((1, 4, 4, 4), dtype=np.float32)  # full cube: 98 verts, 192 tris
    mesh, ovf = cubify(jnp.asarray(grid), 0.5, vert_capacity=16,
                       face_capacity=24, edge_capacity=32)
    assert int(mesh.num_verts()[0]) == 16  # clamped
    assert int(ovf.verts[0]) > 0 and int(ovf.faces[0]) > 0
    # all kept faces must reference in-capacity vertices
    faces = np.asarray(mesh.faces)[0][np.asarray(mesh.faces_mask)[0]]
    if faces.size:
        assert faces.max() < 16


def test_full_cube_counts():
    n = 4
    grid = np.ones((1, n, n, n), dtype=np.float32)
    mesh, _ = cubify(jnp.asarray(grid), 0.5, vert_capacity=512,
                     face_capacity=512, edge_capacity=1024)
    # only the outer shell is exposed: 6*n^2 quads, surface corners 6*(n-1)^2+12*(n-1)+8
    assert int(mesh.num_faces()[0]) == 12 * n * n
    assert int(mesh.num_verts()[0]) == 6 * (n - 1) ** 2 + 12 * (n - 1) + 8
    assert int(mesh.num_edges()[0]) == 380  # stable-sort reference golden


def test_threshold():
    grid = np.full((1, 3, 3, 3), 0.3, dtype=np.float32)
    mesh_lo, _ = cubify(jnp.asarray(grid), 0.2, vert_capacity=128,
                        face_capacity=256, edge_capacity=512)
    mesh_hi, _ = cubify(jnp.asarray(grid), 0.5, vert_capacity=128,
                        face_capacity=256, edge_capacity=512)
    assert int(mesh_lo.num_faces()[0]) == 6 * 9 * 2  # full 3^3 shell
    assert int(mesh_hi.num_faces()[0]) == 0
