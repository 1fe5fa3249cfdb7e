"""Golden-value tests for the op library, ported from the reference test suite
(reference: tests/test_loss_functions.py, tests/test_layers.py) and adapted to the
padded fixed-capacity representation.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from meshrcnn_tpu.ops.chamfer import (_dist_block, chamfer_distance, compute_normals,
                                      knn, nearest_neighbor, smallest_eigenvector)
from meshrcnn_tpu.ops.graph_conv import aggregate_neighbours
from meshrcnn_tpu.ops.losses import edge_loss, voxel_loss
from meshrcnn_tpu.ops.sampling import batched_sample_points, face_areas, sample_points
from meshrcnn_tpu.ops.vert_align import vert_align


from meshrcnn_tpu.utils.shapes import dummy as _np_dummy


def dummy(*dims):
    """Deterministic arange tensor factory (reference: meshRCNN/utils.py:103-108)."""
    return jnp.asarray(_np_dummy(*dims))


# ---------------------------------------------------------------- distances

def test_p2p_distance_golden():
    # reference: tests/test_loss_functions.py:13-31
    a = dummy(5, 3)
    expected = np.array([[0, 27, 108, 243, 432],
                         [27, 0, 27, 108, 243],
                         [108, 27, 0, 27, 108],
                         [243, 108, 27, 0, 27],
                         [432, 243, 108, 27, 0]], dtype=np.float32)
    got = np.asarray(_dist_block(a, a))
    assert np.allclose(got, expected, rtol=1e-5, atol=1e-3)


def test_nearest_neighbor_tiling_matches_dense():
    key = jax.random.PRNGKey(0)
    p = jax.random.normal(key, (97, 3))
    q = jax.random.normal(jax.random.fold_in(key, 1), (53, 3))
    dense = np.asarray(_dist_block(p, q))
    d, i = nearest_neighbor(p, q, tile=16)  # force multiple ragged tiles
    assert np.allclose(np.asarray(d), dense.min(axis=1), atol=1e-4)
    assert (np.asarray(i) == dense.argmin(axis=1)).all()


def test_chamfer_golden():
    # reference: tests/test_loss_functions.py:75-96 — dummy clouds, sums 300 and 21
    pt0 = dummy(10, 3)
    pt1 = dummy(7, 3) + 1
    l0, idx0, l1, idx1 = chamfer_distance(pt0, pt1, tile=4)
    assert idx0.shape == (10,) and idx1.shape == (7,)
    assert float(l0) == 300
    assert float(l1) == 21


def test_knn_matches_dense():
    key = jax.random.PRNGKey(3)
    p = jax.random.normal(key, (64, 3))
    d, i = knn(p, p, k=5, tile=16)
    dense = np.asarray(_dist_block(p, p))
    expect = np.sort(dense, axis=1)[:, :5]
    assert np.allclose(np.sort(np.asarray(d), axis=1), expect, atol=1e-4)


# ---------------------------------------------------------------- aggregation

def test_aggregate_neighbours():
    # adapted from reference tests/test_layers.py:16-26 to unique undirected edges
    f = jnp.asarray([[1., 2, 3], [4, 5, 6], [7, 8, 9]])[None]
    edges = jnp.asarray([[[0, 1], [1, 2], [0, 0]]], dtype=jnp.int32)
    mask = jnp.asarray([[True, True, False]])
    out = np.asarray(aggregate_neighbours(f, edges, mask))[0]
    expected = np.array([[4, 5, 6], [8, 10, 12], [4, 5, 6]], dtype=np.float32)
    assert np.allclose(out, expected)


def test_aggregate_mask_kills_padded_edges():
    f = jnp.ones((1, 4, 2))
    edges = jnp.zeros((1, 5, 2), dtype=jnp.int32)  # all padded at vertex 0
    mask = jnp.zeros((1, 5), dtype=bool)
    out = np.asarray(aggregate_neighbours(f, edges, mask))
    assert (out == 0).all()


# ---------------------------------------------------------------- losses

def test_edge_loss_golden():
    # reference: tests/test_loss_functions.py:57-72 — expected (d01 + d12) / 2 = 27
    pos = dummy(10, 3)[None]
    edges = jnp.asarray([[[0, 1], [1, 2], [0, 0]]], dtype=jnp.int32)
    mask = jnp.asarray([[True, True, False]])
    got = float(edge_loss(pos, edges, mask))
    assert np.isclose(got, 27.0)


def test_voxel_loss():
    pred = jnp.asarray([[0.9, 0.1], [0.8, 0.2]])
    gt = jnp.asarray([[1.0, 0.0], [1.0, 0.0]])
    expected = -np.mean([np.log(0.9), np.log(0.9), np.log(0.8), np.log(0.8)])
    assert np.isclose(float(voxel_loss(pred, gt)), expected, rtol=1e-4)


# ---------------------------------------------------------------- sampling

FIXTURE_POS = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 1], [0, 0, 2], [0, 2, 0],
                        [0, 1, 5], [2, 2, 2], [2, 7, 0], [2, 3, 5], [2, 7, 8],
                        [0, 3, 2]], dtype=np.float32)
FIXTURE_FACES = np.array([[1, 2, 8], [3, 4, 5], [0, 1, 7], [6, 9, 10]], dtype=np.int32)


def test_face_areas_golden():
    # reference: tests/test_loss_functions.py:99-125
    areas = np.asarray(face_areas(jnp.asarray(FIXTURE_POS), jnp.asarray(FIXTURE_FACES)))
    expected = np.array([1.22474, 4., 3.5, 8.3666], dtype=np.float32)
    assert np.allclose(areas, expected, rtol=1e-4)


def test_sampling_shape_and_support():
    # reference: tests/test_loss_functions.py:128-149
    key = jax.random.PRNGKey(0)
    mask = jnp.ones((4,), dtype=bool)
    pts, valid = sample_points(key, jnp.asarray(FIXTURE_POS), jnp.asarray(FIXTURE_FACES),
                               mask, 2000, normalize=False)
    assert pts.shape == (2000, 3)
    assert bool(valid)
    # every sampled point is a convex combination of its face's vertices ->
    # inside the mesh bounding box
    p = np.asarray(pts)
    assert (p >= FIXTURE_POS.min(0) - 1e-4).all() and (p <= FIXTURE_POS.max(0) + 1e-4).all()


def test_sampling_respects_face_mask():
    key = jax.random.PRNGKey(1)
    # mask out all but face 1 (verts 3,4,5) — all samples must be on that triangle
    mask = jnp.asarray([False, True, False, False])
    pts, valid = sample_points(key, jnp.asarray(FIXTURE_POS), jnp.asarray(FIXTURE_FACES),
                               mask, 500, normalize=False)
    tri = FIXTURE_POS[[3, 4, 5]]
    p = np.asarray(pts)
    assert (p >= tri.min(0) - 1e-4).all() and (p <= tri.max(0) + 1e-4).all()


def test_sampling_empty_mesh():
    key = jax.random.PRNGKey(2)
    mask = jnp.zeros((4,), dtype=bool)
    pts, valid = sample_points(key, jnp.asarray(FIXTURE_POS), jnp.asarray(FIXTURE_FACES),
                               mask, 100)
    assert not bool(valid)
    assert (np.asarray(pts) == 0).all()


def test_batched_sampling_normalized():
    key = jax.random.PRNGKey(3)
    verts = jnp.asarray(np.stack([FIXTURE_POS, FIXTURE_POS * 2.0]))
    faces = jnp.asarray(np.stack([FIXTURE_FACES, FIXTURE_FACES]))
    mask = jnp.ones((2, 4), dtype=bool)
    pts, valid = batched_sample_points(key, verts, faces, mask, 1000)
    assert pts.shape == (2, 1000, 3)
    # normalize_mesh semantics: centered; max norm <= 1 when scaling triggered
    p = np.asarray(pts)
    norms = np.linalg.norm(p, axis=-1)
    assert (norms <= 1.0 + 1e-4).all()
    assert np.allclose(p.mean(axis=1), 0.0, atol=1e-2)


# ---------------------------------------------------------------- normals

def test_smallest_eigenvector_matches_lapack():
    rng = np.random.RandomState(0)
    A = rng.randn(50, 3, 3).astype(np.float32)
    S = A @ A.transpose(0, 2, 1)
    v = np.asarray(smallest_eigenvector(jnp.asarray(S)))
    w, V = np.linalg.eigh(S)
    expect = V[:, :, 0]  # eigenvector of smallest eigenvalue
    dots = np.abs(np.sum(v * expect, axis=-1))
    assert (dots > 0.999).all()


def test_compute_normals_plane():
    rng = np.random.RandomState(1)
    pts = np.zeros((200, 3), dtype=np.float32)
    pts[:, :2] = rng.randn(200, 2)  # z = 0 plane
    normals = np.asarray(compute_normals(jnp.asarray(pts), k=10, tile=64))
    assert (np.abs(normals[:, 2]) > 0.99).all()


# ---------------------------------------------------------------- vert_align

def test_vert_align_shapes():
    # reference: tests/test_layers.py:37-54 — pyramid gives sum-channel 3840
    key = jax.random.PRNGKey(0)
    B, V = 2, 50
    H = W = 137
    fmaps = [jax.random.normal(jax.random.fold_in(key, i), (B, s, s, c))
             for i, (s, c) in enumerate([(35, 256), (18, 512), (9, 1024), (5, 2048)])]
    verts = jax.random.uniform(jax.random.fold_in(key, 9), (B, V, 3),
                               minval=1.0, maxval=40.0)
    out = vert_align(fmaps, verts, (H, W))
    assert out.shape == (B, V, 3840)

    single = [jax.random.normal(key, (B, 12, 12, 256))]
    out = vert_align(single, verts, (224, 224))
    assert out.shape == (B, V, 256)


def test_vert_align_bilinear_exact():
    # constant feature map -> every in-range vertex pools exactly that constant
    fmap = jnp.full((1, 8, 8, 4), 3.5)
    verts = jnp.asarray([[[5.0, 5.0, -10.0], [1.0, 2.0, -3.0]]])
    out = np.asarray(vert_align([fmap], verts, (64, 64)))
    assert np.allclose(out, 3.5, atol=1e-5)


def test_normal_loss_grads_finite_on_degenerate_clouds():
    """Regression: lattice-regular + duplicated points (exactly what cubify
    vertices and with-replacement sampling produce) make the PCA scatter matrix
    isotropic / gap-degenerate; the eigensolver's gradient must stay finite
    (arccos at +-1 and 0-norm cross products used to emit NaNs that poisoned
    every refine-stage parameter — and a 0.0 loss weight does NOT block them,
    since 0 x NaN = NaN under reverse AD)."""
    from meshrcnn_tpu.ops.chamfer import batched_normal_distance, chamfer_distance

    g = np.stack(np.meshgrid(np.arange(4.0), np.arange(4.0), np.arange(4.0),
                             indexing="ij"), -1).reshape(-1, 3)
    p = np.concatenate([g, g[:32]])[None].astype(np.float32)   # dups included
    q = (g[None] * 0.9 + 0.05).astype(np.float32)[:, :96]

    def loss(pp):
        _, ip, _, iq = chamfer_distance(pp[0], jnp.asarray(q)[0], 32)
        ap, aq = batched_normal_distance(pp, jnp.asarray(q), ip[None], iq[None],
                                         k=6, tile=32)
        return -(ap + aq).sum() / 96.0

    val, grad = jax.value_and_grad(loss)(jnp.asarray(p))
    assert np.isfinite(float(val))
    assert int(jnp.isnan(grad).sum()) == 0
    assert int(jnp.isinf(grad).sum()) == 0

    # the 0-weight trap: scaling the term by 0.0 must not resurrect NaNs
    v2, g2 = jax.value_and_grad(lambda pp: 0.0 * loss(pp))(jnp.asarray(p))
    assert int(jnp.isnan(g2).sum()) == 0


def test_knn_adaptive_subtile_recall():
    """The adaptive subtile must keep approximate-kNN recall high in the
    small-cloud regime where the fixed subtile collapsed (quantified in
    PERFORMANCE.md: 0.77 recall at M=2048 with subtile=128 -> 0.97 adaptive)."""
    from meshrcnn_tpu.ops.chamfer import knn

    rng = np.random.RandomState(3)
    p = jnp.asarray(rng.randn(2048, 3).astype(np.float32))
    ie = np.asarray(knn(p, p, 10, tile=2048, exact=True)[1])
    ia = np.asarray(knn(p, p, 10, tile=2048)[1])
    recall = np.mean([len(set(ie[i]) & set(ia[i])) / 10.0 for i in range(2048)])
    assert recall >= 0.9, recall


def test_knn_non_pow2_cloud():
    """M=1500 leaves the adaptive-subtile loop at s=8 with T % s != 0; the tile
    must be padded so the reshape stays legal (ADVICE r2 finding 3) and the
    padded columns must never win (they are masked to inf)."""
    from meshrcnn_tpu.ops.chamfer import knn

    rng = np.random.RandomState(7)
    p = jnp.asarray(rng.randn(100, 3).astype(np.float32))
    q = jnp.asarray(rng.randn(1500, 3).astype(np.float32))
    d_a, i_a = jax.jit(lambda p, q: knn(p, q, 10, tile=2048))(p, q)
    i_a = np.asarray(i_a)
    assert (i_a >= 0).all() and (i_a < 1500).all()
    d_e, i_e = knn(p, q, 10, tile=2048, exact=True)
    recall = np.mean([len(set(np.asarray(i_e)[i]) & set(i_a[i])) / 10.0
                      for i in range(100)])
    assert recall >= 0.9, recall


def test_batched_compute_normals_lax_map_grads():
    """batched_compute_normals now lax.maps over the batch (VERDICT r2 weak
    item 6): values must match the per-sample call and gradients stay finite."""
    from meshrcnn_tpu.ops.chamfer import batched_compute_normals, compute_normals

    rng = np.random.RandomState(11)
    pts = jnp.asarray(rng.randn(3, 256, 3).astype(np.float32))
    n_b = np.asarray(batched_compute_normals(pts, k=6, tile=256))
    for b in range(3):
        n_s = np.asarray(compute_normals(pts[b], k=6, tile=256))
        np.testing.assert_allclose(np.abs(n_b[b]), np.abs(n_s), atol=1e-5)
    g = jax.grad(lambda x: jnp.sum(batched_compute_normals(x, k=6, tile=256)))(pts)
    assert np.isfinite(np.asarray(g)).all()


def test_aggregate_large_batch_chunking():
    """B > 8 routes through the chunked lax.map path (TPU worker-fault
    workaround, ROADMAP.md); outputs must equal the single-program path and
    gradients must flow through the custom VJP identically. On CPU the chunked
    path only engages under MESHRCNN_FORCE_AGG_CHUNK (backend-gated)."""
    os.environ["MESHRCNN_FORCE_AGG_CHUNK"] = "1"
    from meshrcnn_tpu.ops.graph_conv import (_AGG_SAFE_BATCH,
                                             _aggregate_one_chunk,
                                             aggregate_neighbours,
                                             precompute_adjacency)

    rng = np.random.RandomState(5)
    B, V, E, C = 12, 64, 128, 16
    assert B > _AGG_SAFE_BATCH
    edges = rng.randint(0, V, (B, E, 2)).astype(np.int32)
    mask = rng.rand(B, E) > 0.3
    feats = jnp.asarray(rng.randn(B, V, C).astype(np.float32))
    topo = precompute_adjacency(jnp.asarray(edges), jnp.asarray(mask), V)

    out = aggregate_neighbours(feats, topo)
    ref = _aggregate_one_chunk(feats, topo)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    g = jax.grad(lambda f: jnp.sum(aggregate_neighbours(f, topo) ** 2))(feats)
    g_ref = jax.grad(lambda f: jnp.sum(_aggregate_one_chunk(f, topo) ** 2))(feats)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=5e-5)
    os.environ.pop("MESHRCNN_FORCE_AGG_CHUNK", None)


def test_aggregate_chunking_non_divisible_batch():
    """B=10 pads to 12 (chunk 4); the padded tail must not leak into outputs."""
    os.environ["MESHRCNN_FORCE_AGG_CHUNK"] = "1"
    from meshrcnn_tpu.ops.graph_conv import (_aggregate_one_chunk,
                                             aggregate_neighbours,
                                             precompute_adjacency)

    rng = np.random.RandomState(6)
    B, V, E, C = 10, 32, 64, 8
    edges = rng.randint(0, V, (B, E, 2)).astype(np.int32)
    mask = rng.rand(B, E) > 0.5
    feats = jnp.asarray(rng.randn(B, V, C).astype(np.float32))
    topo = precompute_adjacency(jnp.asarray(edges), jnp.asarray(mask), V)
    out = aggregate_neighbours(feats, topo)
    ref = _aggregate_one_chunk(feats, topo)
    assert out.shape == (B, V, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    os.environ.pop("MESHRCNN_FORCE_AGG_CHUNK", None)


# ---------------------------------------------------------------- face normals

def _plane_mesh(nx=8, ny=8, z=0.0, jitter=None, seed=0):
    """Grid-triangulated plane at height z: verts [nx*ny, 3], faces [2(nx-1)(ny-1), 3]."""
    xs, ys = np.meshgrid(np.linspace(0, 1, nx), np.linspace(0, 1, ny), indexing="ij")
    verts = np.stack([xs, ys, np.full_like(xs, z)], -1).reshape(-1, 3)
    if jitter is not None:
        rng = np.random.RandomState(seed)
        verts[:, :2] += rng.randn(*verts[:, :2].shape) * jitter
    faces = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a, b, c, d = (i * ny + j, i * ny + j + 1,
                          (i + 1) * ny + j, (i + 1) * ny + j + 1)
            faces += [[a, b, c], [b, d, c]]
    return verts.astype(np.float32), np.asarray(faces, np.int32)


def test_sampling_face_normals_exact():
    """return_normals gives the sampled triangle's unit normal: on a one-face
    mesh every sample's normal equals that triangle's cross-product normal."""
    key = jax.random.PRNGKey(4)
    mask = jnp.asarray([False, True, False, False])          # only face 1 (verts 3,4,5)
    pts, valid, normals = batched_sample_points(
        key, jnp.asarray(FIXTURE_POS)[None], jnp.asarray(FIXTURE_FACES)[None],
        mask[None], 200, normalize=False, return_normals=True)
    assert bool(valid[0])
    tri = FIXTURE_POS[[3, 4, 5]]
    n = np.cross(tri[1] - tri[0], tri[2] - tri[0])
    n = n / np.linalg.norm(n)
    got = np.asarray(normals[0])
    assert np.allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)
    assert np.allclose(got, n[None], atol=1e-5)


def test_sampling_face_normals_empty_mesh_and_degenerate():
    key = jax.random.PRNGKey(5)
    # empty mesh -> zero normals, no NaNs
    mask0 = jnp.zeros((1, 4), dtype=bool)
    _, valid, normals = batched_sample_points(
        key, jnp.asarray(FIXTURE_POS)[None], jnp.asarray(FIXTURE_FACES)[None],
        mask0, 50, return_normals=True)
    assert not bool(valid[0])
    assert (np.asarray(normals) == 0).all()
    # degenerate (zero-area) triangle forced by a collapsed mesh: the +z
    # fallback keeps values and gradients finite
    verts = jnp.zeros((1, 11, 3), dtype=jnp.float32)
    mask1 = jnp.ones((1, 4), dtype=bool)

    def f(v):
        _, _, nn = batched_sample_points(key, v, jnp.asarray(FIXTURE_FACES)[None],
                                         mask1, 50, return_normals=True)
        return jnp.sum(nn ** 2)

    g = jax.grad(f)(verts)
    assert np.isfinite(np.asarray(g)).all()


def test_mesh_loss_face_normals_matches_pca_on_plane():
    """On a plane every estimator must agree: the face-normal path (default)
    and the kNN+PCA path (MESHRCNN_FACE_NORMALS=0) give the same chamfer/edge
    losses (identical clouds — same keys) and near-identical normal loss."""
    from meshrcnn_tpu.core.mesh import MeshBatch
    from meshrcnn_tpu.ops.losses import mesh_loss

    pv, pf = _plane_mesh(8, 8, z=0.0, jitter=0.02, seed=1)
    gv, gf = _plane_mesh(7, 9, z=0.0, jitter=0.02, seed=2)
    V = max(len(pv), len(gv)) + 3
    F = max(len(pf), len(gf)) + 5

    def pad(v, f):
        vp = np.zeros((V, 3), np.float32); vp[:len(v)] = v
        fp = np.zeros((F, 3), np.int32);  fp[:len(f)] = f
        fm = np.zeros((F,), bool);        fm[:len(f)] = True
        return vp, fp, fm

    pvp, pfp, pfm = pad(pv, pf)
    gvp, gfp, gfm = pad(gv, gf)
    # edges from faces (content irrelevant to the normal term)
    edges = np.stack([pfp[:, 0], pfp[:, 1]], -1).astype(np.int32)
    mesh = MeshBatch(verts=jnp.asarray(pvp)[None],
                     verts_mask=jnp.ones((1, V), bool),
                     faces=jnp.asarray(pfp)[None],
                     faces_mask=jnp.asarray(pfm)[None],
                     edges=jnp.asarray(edges)[None],
                     edges_mask=jnp.asarray(pfm)[None])

    key = jax.random.PRNGKey(7)
    args = (key, jnp.asarray(pvp)[None], mesh, jnp.asarray(gvp)[None],
            jnp.asarray(gfp)[None], jnp.asarray(gfm)[None])
    os.environ["MESHRCNN_FACE_NORMALS"] = "1"
    c1, n1, e1 = mesh_loss(*args, point_cloud_size=512, num_neighbours=8, tile=256)
    os.environ["MESHRCNN_FACE_NORMALS"] = "0"
    c0, n0, e0 = mesh_loss(*args, point_cloud_size=512, num_neighbours=8, tile=256)
    os.environ.pop("MESHRCNN_FACE_NORMALS", None)

    assert np.allclose(float(c1), float(c0), rtol=1e-6)
    assert np.allclose(float(e1), float(e0), rtol=1e-6)
    # plane: both estimators say +-z for every point -> |cos| = 1 everywhere
    # up to PCA edge effects; the values must agree tightly
    assert np.allclose(float(n1), float(n0), rtol=5e-3, atol=5e-3)
    assert float(n1) < -0.95  # ~ -1.0 x 2 sides / 2... (two summed |cos| terms / N)


def test_mesh_loss_face_normals_grads():
    """Gradients of the face-normal loss w.r.t. pred verts are finite and
    nonzero (the cross-product VJP path)."""
    from meshrcnn_tpu.core.mesh import MeshBatch
    from meshrcnn_tpu.ops.losses import mesh_loss

    pv, pf = _plane_mesh(6, 6, z=0.0, jitter=0.05, seed=3)
    gv, gf = _plane_mesh(6, 6, z=0.0, jitter=0.05, seed=4)
    V, F = len(pv), len(pf)
    edges = np.stack([pf[:, 0], pf[:, 1]], -1).astype(np.int32)
    mesh = MeshBatch(verts=jnp.asarray(pv)[None],
                     verts_mask=jnp.ones((1, V), bool),
                     faces=jnp.asarray(pf)[None],
                     faces_mask=jnp.ones((1, F), bool),
                     edges=jnp.asarray(edges)[None],
                     edges_mask=jnp.ones((1, F), bool))
    key = jax.random.PRNGKey(9)
    os.environ["MESHRCNN_FACE_NORMALS"] = "1"

    def f(v):
        _, n, _ = mesh_loss(key, v, mesh, jnp.asarray(gv)[None],
                            jnp.asarray(gf)[None], jnp.ones((1, F), bool),
                            point_cloud_size=256, num_neighbours=6, tile=128)
        return n

    g = np.asarray(jax.grad(f)(jnp.asarray(pv)[None]))
    os.environ.pop("MESHRCNN_FACE_NORMALS", None)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0


def test_counting_searchsorted_matches_bisection():
    """The gather-free counting searchsorted (TPU default, ops/gather.py) must
    equal the bisection on duplicate-heavy keys and out-of-range queries."""
    from meshrcnn_tpu.ops.gather import batched_searchsorted, counting_searchsorted
    rng = np.random.RandomState(0)
    keys = np.sort(rng.randint(0, 40, size=(3, 37)), axis=1).astype(np.float32)
    queries = rng.randint(-3, 45, size=(3, 29)).astype(np.float32)
    for side in ("left", "right"):
        a = counting_searchsorted(jnp.asarray(keys), jnp.asarray(queries), side)
        b = batched_searchsorted(jnp.asarray(keys), jnp.asarray(queries), side)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("n,capacity,density", [
    (1500, 64, 0.3),     # N not a multiple of the 128 block
    (1024, 256, 0.05),   # sparse keeps
    (640, 32, 0.9),      # overflow: count >> capacity
    (256, 64, 0.0),      # nothing kept
    (256, 300, 1.0),     # everything kept, capacity > N
])
def test_compact_from_cumsum_matches_bisection(n, capacity, density):
    """Hierarchical counting compaction (cubify's TPU path) == bisection
    compaction on valid slots, masks, and counts."""
    from meshrcnn_tpu.ops.gather import (batched_gather_rows,
                                         batched_searchsorted,
                                         compact_from_cumsum)
    rng = np.random.RandomState(int(n + capacity))
    flags = (rng.rand(4, n) < density).astype(np.int32)
    cum = jnp.cumsum(jnp.asarray(flags), axis=1)

    src_c, mask_c, count_c = compact_from_cumsum(cum, capacity)
    # reference: bisection formula (the pre-existing _compact body)
    q = jnp.broadcast_to(jnp.arange(1, capacity + 1)[None], (4, capacity))
    src_b = jnp.minimum(batched_searchsorted(cum, q, side="left"), n - 1)
    count_b = cum[:, -1]
    mask_b = (q - 1) < jnp.minimum(count_b, capacity)[:, None]

    np.testing.assert_array_equal(np.asarray(count_c), np.asarray(count_b))
    np.testing.assert_array_equal(np.asarray(mask_c), np.asarray(mask_b))
    m = np.asarray(mask_b)
    np.testing.assert_array_equal(np.asarray(src_c)[m], np.asarray(src_b)[m])
    # masked slots must still be in-bounds (downstream gathers before masking)
    assert (np.asarray(src_c) >= 0).all() and (np.asarray(src_c) < n).all()


def test_cubify_counting_path_matches_bisection():
    """End-to-end cubify under MESHRCNN_COUNTING_SEARCH=1 (the TPU default
    path) must produce the identical mesh to the CPU bisection path."""
    from meshrcnn_tpu.ops import cubify as cubify_mod
    rng = np.random.RandomState(7)
    grid = jnp.asarray(rng.rand(2, 6, 6, 6).astype(np.float32))
    caps = dict(vert_capacity=512, face_capacity=1024, edge_capacity=1024)

    def run():
        return cubify_mod.cubify(grid, threshold=0.5, **caps)[0]

    os.environ["MESHRCNN_COUNTING_SEARCH"] = "0"
    try:
        ref = run()
        os.environ["MESHRCNN_COUNTING_SEARCH"] = "1"
        got = run()
    finally:
        os.environ.pop("MESHRCNN_COUNTING_SEARCH", None)
    for name in ("verts", "verts_mask", "faces", "faces_mask", "edges",
                 "edges_mask"):
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(got, name))
        vm = np.asarray(ref.verts_mask) if name == "verts" else None
        if name in ("verts",):
            np.testing.assert_allclose(a[vm], b[vm], rtol=0, atol=0)
        elif name.endswith("_mask"):
            np.testing.assert_array_equal(a, b)
        else:
            m = np.asarray(getattr(ref, name + "_mask"))
            np.testing.assert_array_equal(a[m], b[m])


def test_precompute_adjacency_counting_matches_bisection():
    """precompute_adjacency's histogram boundaries (TPU counting path) must
    equal the bisection searchsorted boundaries on duplicate/sentinel edges."""
    from meshrcnn_tpu.ops.graph_conv import precompute_adjacency
    rng = np.random.RandomState(3)
    V, E, B = 23, 40, 3
    edges = rng.randint(0, V, size=(B, E, 2)).astype(np.int32)
    mask = rng.rand(B, E) < 0.7
    os.environ["MESHRCNN_COUNTING_SEARCH"] = "0"
    try:
        ref = precompute_adjacency(jnp.asarray(edges), jnp.asarray(mask), V)
        os.environ["MESHRCNN_COUNTING_SEARCH"] = "1"
        got = precompute_adjacency(jnp.asarray(edges), jnp.asarray(mask), V)
    finally:
        os.environ.pop("MESHRCNN_COUNTING_SEARCH", None)
    for f in ("src_lo", "starts_lo", "ends_lo", "src_hi", "starts_hi",
              "ends_hi"):
        np.testing.assert_array_equal(np.asarray(getattr(ref, f)),
                                      np.asarray(getattr(got, f)), err_msg=f)


def test_take_rows_mxu_grads_match_scatter():
    """take_rows_mxu (matmul-backward gather, TPU default) must match the
    plain gather's autodiff scatter-add gradient through the REAL call sites:
    batched_sample_points and vert_align."""
    from meshrcnn_tpu.ops.vert_align import vert_align
    rng = np.random.RandomState(11)
    key = jax.random.PRNGKey(5)
    B, V, F, N = 2, 24, 30, 64
    verts = rng.randn(B, V, 3).astype(np.float32)
    faces = rng.randint(0, V, (B, F, 3)).astype(np.int32)
    fmask = (rng.rand(B, F) < 0.8)
    fmap = rng.randn(B, 7, 9, 5).astype(np.float32)

    os.environ["MESHRCNN_MXU_SCATTER_MIN_C"] = "0"  # force even C=3 through

    def loss_sample(v, flag):
        os.environ["MESHRCNN_MXU_SCATTER"] = flag
        pts, _ = batched_sample_points(key, v, jnp.asarray(faces),
                                       jnp.asarray(fmask), N)
        return jnp.sum(pts * pts)

    def loss_align(args, flag):
        v, fm = args
        os.environ["MESHRCNN_MXU_SCATTER"] = flag
        out = vert_align([fm], v, (14, 14))
        return jnp.sum(out * jnp.cos(out))

    try:
        g_mx = jax.grad(lambda v: loss_sample(v, "1"))(jnp.asarray(verts))
        g_sc = jax.grad(lambda v: loss_sample(v, "0"))(jnp.asarray(verts))
        np.testing.assert_allclose(np.asarray(g_mx), np.asarray(g_sc),
                                   rtol=1e-3, atol=1e-5)
        a_mx = jax.grad(lambda a: loss_align(a, "1"))(
            (jnp.asarray(verts), jnp.asarray(fmap)))
        a_sc = jax.grad(lambda a: loss_align(a, "0"))(
            (jnp.asarray(verts), jnp.asarray(fmap)))
        for x, y in zip(jax.tree_util.tree_leaves(a_mx),
                        jax.tree_util.tree_leaves(a_sc)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-3, atol=1e-5)
    finally:
        os.environ.pop("MESHRCNN_MXU_SCATTER", None)
        os.environ.pop("MESHRCNN_MXU_SCATTER_MIN_C", None)


def test_packed_topo_matches_argsort():
    """The packed-key sort topology (default) must produce the same segment
    boundaries and the same segment *contents* as the argsort+gather path —
    within-segment order may differ (src-sorted vs original slot order), so
    aggregation is compared on integer features where summation is exact."""
    from meshrcnn_tpu.ops.graph_conv import (aggregate_neighbours,
                                             precompute_adjacency)
    rng = np.random.RandomState(7)
    V, E, B = 23, 40, 3
    edges = rng.randint(0, V, size=(B, E, 2)).astype(np.int32)
    # include garbage (out-of-range) src values on padded slots: the pack
    # must clamp them rather than let them corrupt the key bits
    mask = rng.rand(B, E) < 0.7
    edges[~mask] = rng.randint(-5, 3 * V, size=edges[~mask].shape)
    feats = rng.randint(-4, 5, size=(B, V, 8)).astype(np.float32)
    os.environ["MESHRCNN_PACKED_TOPO"] = "0"
    try:
        t_ref = precompute_adjacency(jnp.asarray(edges), jnp.asarray(mask), V)
        a_ref = aggregate_neighbours(jnp.asarray(feats), t_ref)
        os.environ["MESHRCNN_PACKED_TOPO"] = "1"
        t_got = precompute_adjacency(jnp.asarray(edges), jnp.asarray(mask), V)
        a_got = aggregate_neighbours(jnp.asarray(feats), t_got)
    finally:
        os.environ.pop("MESHRCNN_PACKED_TOPO", None)
    for f in ("starts_lo", "ends_lo", "starts_hi", "ends_hi"):
        np.testing.assert_array_equal(np.asarray(getattr(t_ref, f)),
                                      np.asarray(getattr(t_got, f)), err_msg=f)
    # segment contents: sort each vertex's slice of srcs before comparing
    for side in ("lo", "hi"):
        sref = np.asarray(getattr(t_ref, f"src_{side}"))
        sgot = np.asarray(getattr(t_got, f"src_{side}"))
        starts = np.asarray(getattr(t_ref, f"starts_{side}"))
        ends = np.asarray(getattr(t_ref, f"ends_{side}"))
        for b in range(B):
            for v in range(V):
                np.testing.assert_array_equal(
                    np.sort(sref[b, starts[b, v]:ends[b, v]]),
                    np.sort(sgot[b, starts[b, v]:ends[b, v]]),
                    err_msg=f"{side} segment b={b} v={v}")
    np.testing.assert_array_equal(np.asarray(a_ref), np.asarray(a_got))


def test_aggregate_bf16_close_and_self_adjoint():
    """MESHRCNN_AGG_BF16=1 (opt-in bandwidth path) must stay within bf16
    rounding of the f32 aggregation, preserve output dtype, and keep the
    self-adjoint custom VJP."""
    from meshrcnn_tpu.ops.graph_conv import (aggregate_neighbours,
                                             precompute_adjacency)
    rng = np.random.RandomState(9)
    B, V, E, C = 2, 48, 96, 16
    edges = rng.randint(0, V, (B, E, 2)).astype(np.int32)
    mask = rng.rand(B, E) > 0.3
    feats = rng.randn(B, V, C).astype(np.float32)
    topo = precompute_adjacency(jnp.asarray(edges), jnp.asarray(mask), V)

    def run(flag):
        os.environ["MESHRCNN_AGG_BF16"] = flag
        out = aggregate_neighbours(jnp.asarray(feats), topo)
        g = jax.grad(lambda f: jnp.sum(
            aggregate_neighbours(f, topo) ** 2))(jnp.asarray(feats))
        return out, g

    try:
        out16, g16 = run("1")
        out32, g32 = run("0")
    finally:
        os.environ.pop("MESHRCNN_AGG_BF16", None)
    assert out16.dtype == jnp.float32
    scale = float(jnp.max(jnp.abs(out32))) + 1e-9
    assert float(jnp.max(jnp.abs(out16 - out32))) / scale < 2e-2
    gscale = float(jnp.max(jnp.abs(g32))) + 1e-9
    assert float(jnp.max(jnp.abs(g16 - g32))) / gscale < 2e-2


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="matmul precision only differs on TPU")
def test_cumsum_high_vs_highest_segment_sums_tpu(monkeypatch):
    """The prefix-sum matmul's HIGH default (graph_conv._cumsum_precision) must
    track HIGHEST within f32 round-off at realistic aggregation magnitudes —
    the TPU-visible bound backing the default (ADVICE r3: CPU ignores
    precision, so only a TPU-marked test can catch a regression)."""
    from meshrcnn_tpu.ops.graph_conv import aggregate_neighbours, precompute_adjacency

    rng = np.random.RandomState(0)
    B, V, E, C = 2, 4096, 16384, 128
    edges = rng.randint(0, V, (B, E, 2)).astype(np.int32)
    mask = rng.rand(B, E) < 0.9
    # realistic: post-ReLU GraphConv activations, O(1) scale with occasional spikes
    feats = np.maximum(rng.randn(B, V, C), 0).astype(np.float32)
    feats[:, rng.randint(0, V, 16)] *= 30.0
    topo = precompute_adjacency(jnp.asarray(edges), jnp.asarray(mask), V)

    def run():
        return np.asarray(jax.jit(lambda f: aggregate_neighbours(f, topo))(
            jnp.asarray(feats)))

    monkeypatch.setenv("MESHRCNN_CUMSUM_PRECISION", "high")
    got_high = run()
    monkeypatch.setenv("MESHRCNN_CUMSUM_PRECISION", "highest")
    got_highest = run()
    # per-vertex neighbour sums are O(deg~4) values of O(1): absolute 1e-3
    # leaves ~100x headroom over bf16-3-pass round-off at the cumsum scale
    err = np.abs(got_high - got_highest)
    rel = err / np.maximum(np.abs(got_highest), 1.0)
    assert rel.max() < 1e-3, (rel.max(), err.max())
