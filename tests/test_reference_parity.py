"""Numerical parity against the reference's own loss math (torch, CPU).

Re-executes the reference's loss formulas (reference: meshRCNN/loss_functions.py —
re-implemented inline here from the public equations; no torchvision needed) on the
SAME inputs as our jax ops and compares values. This pins down the conventions
SURVEY.md §6 calls out: chamfer as summed mins divided once by cloud size, edge loss
with a batch-global normaliser, BCE on probabilities.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from meshrcnn_tpu.ops.chamfer import chamfer_distance
from meshrcnn_tpu.ops.losses import edge_loss, voxel_loss
from meshrcnn_tpu.ops.sampling import face_areas


def ref_p2p(pt0, pt1):
    """reference batched_point2point_distance (loss_functions.py:192-220)."""
    xx = torch.bmm(pt0, pt0.transpose(2, 1))
    yy = torch.bmm(pt1, pt1.transpose(2, 1))
    zz = torch.bmm(pt0, pt1.transpose(2, 1))
    rx = xx.diagonal(dim1=1, dim2=2).unsqueeze(1).expand_as(zz.transpose(2, 1))
    ry = yy.diagonal(dim1=1, dim2=2).unsqueeze(1).expand_as(zz)
    return rx.transpose(2, 1) + ry - 2 * zz


def test_chamfer_parity():
    rng = np.random.RandomState(0)
    p = rng.randn(500, 3).astype(np.float32)
    g = rng.randn(400, 3).astype(np.float32)
    # reference: torch.min over both axes of the full p2p matrix, summed
    d = ref_p2p(torch.from_numpy(p)[None], torch.from_numpy(g)[None])
    ref_1 = float(torch.min(d, 2).values.sum())
    ref_2 = float(torch.min(d, 1).values.sum())
    s_p, _, s_g, _ = chamfer_distance(jnp.asarray(p), jnp.asarray(g), tile=128)
    assert np.isclose(float(s_p), ref_1, rtol=1e-4)
    assert np.isclose(float(s_g), ref_2, rtol=1e-4)


def test_edge_loss_parity():
    rng = np.random.RandomState(1)
    verts = rng.randn(64, 3).astype(np.float32)
    e = rng.randint(0, 64, (100, 2)).astype(np.int64)
    e = e[e[:, 0] != e[:, 1]]
    e = np.unique(np.sort(e, axis=1), axis=0)
    # reference total_edge_length (loss_functions.py:175-189): COO with both
    # directions, masked p2p gather, sum / (2|E|) — the double count cancels
    coo = np.concatenate([e, e[:, ::-1]], axis=0).T
    d = ref_p2p(torch.from_numpy(verts)[None], torch.from_numpy(verts)[None])[0]
    masked = d[coo[0], coo[1]]
    ref = float(masked.sum() / masked.shape[0])

    E = 128
    edges = np.zeros((1, E, 2), np.int32)
    edges[0, :len(e)] = e
    mask = np.zeros((1, E), bool)
    mask[0, :len(e)] = True
    got = float(edge_loss(jnp.asarray(verts)[None], jnp.asarray(edges),
                          jnp.asarray(mask)))
    assert np.isclose(got, ref, rtol=1e-4)


def test_voxel_loss_parity():
    rng = np.random.RandomState(2)
    pred = rng.rand(2, 8, 8, 8).astype(np.float32) * 0.98 + 0.01
    gt = (rng.rand(2, 8, 8, 8) > 0.5).astype(np.float32)
    ref = float(torch.nn.functional.binary_cross_entropy(
        torch.from_numpy(pred), torch.from_numpy(gt), reduction="mean"))
    got = float(voxel_loss(jnp.asarray(pred), jnp.asarray(gt)))
    assert np.isclose(got, ref, rtol=1e-4)


def test_surface_area_parity():
    rng = np.random.RandomState(3)
    verts = rng.randn(50, 3).astype(np.float32)
    faces = rng.randint(0, 50, (30, 3)).astype(np.int64)
    # reference surface_areas (mesh_sampling.py:39-57)
    tv = torch.from_numpy(verts)
    tf = torch.from_numpy(faces)
    pts = tv[tf]
    ab = pts[:, 1] - pts[:, 0]
    ac = pts[:, 2] - pts[:, 0]
    ref = (torch.cross(ab, ac, dim=1).norm(p=2, dim=1) / 2).numpy()
    got = np.asarray(face_areas(jnp.asarray(verts), jnp.asarray(faces)))
    assert np.allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_normalize_cloud_parity():
    # reference normalize_mesh (process.py:7-20) on a sampled cloud
    from meshrcnn_tpu.core.mesh import normalize_verts
    rng = np.random.RandomState(4)
    pts = rng.randn(200, 3).astype(np.float32) * 5.0
    t = torch.from_numpy(pts)
    t = t - t.mean(0)
    factor = torch.sqrt(t.mm(t.T).diagonal().max())
    ref = (t / factor).numpy()
    got = np.asarray(normalize_verts(jnp.asarray(pts)))
    assert np.allclose(got, ref, rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(not __import__("os").path.exists(
    "/root/reference/shapenet_ex/00_voxel_obj0.npy"),
    reason="reference artifacts not mounted")
def test_cubify_artifact_parity():
    """Run our cubify on the reference's shipped 48^3 voxel prediction and compare
    against its shipped stage-0 mesh (reference: shapenet_ex/, produced by demo.py):
    the vertex SET and face SET must match exactly (2629 verts / 4896 tris)."""
    from meshrcnn_tpu.data.serialization import load_mesh
    from meshrcnn_tpu.ops.cubify import cubify

    v = np.load("/root/reference/shapenet_ex/00_voxel_obj0.npy").astype(np.float32)
    mesh, ovf = cubify(jnp.asarray(v)[None], 0.5, vert_capacity=4096,
                       face_capacity=8192, edge_capacity=16384)
    ref = load_mesh("/root/reference/shapenet_ex/00_mesh_stage0_obj_0.obj")
    assert int(mesh.num_verts()[0]) == ref.vertices.shape[0] == 2629
    assert int(mesh.num_faces()[0]) == ref.faces.shape[0] == 4896
    mine = np.asarray(mesh.verts[0])[np.asarray(mesh.verts_mask[0])]
    assert ({tuple(np.round(x, 3)) for x in mine}
            == {tuple(np.round(x, 3)) for x in ref.vertices})
    fm = np.asarray(mesh.faces[0])[np.asarray(mesh.faces_mask[0])]
    tri_mine = {tuple(sorted(map(tuple, np.round(mine[f], 3)))) for f in fm}
    tri_ref = {tuple(sorted(map(tuple, np.round(ref.vertices[f], 3))))
               for f in ref.faces}
    assert tri_mine == tri_ref
