"""Layer-level tests ported from the reference suite (reference: tests/test_layers.py):
GraphConv golden, refinement cells on a synthetic two-ring graph, VoxelBranch and
backbone shape contracts.
"""
import numpy as np
import jax
import jax.numpy as jnp

from meshrcnn_tpu.models.layers import (GraphConv, ResGraphConv,
                                        ResVertixRefineShapenet, VertixRefinePix3D,
                                        VertixRefineShapeNet, VoxelBranch)
from meshrcnn_tpu.models.resnet import ResNet50
from meshrcnn_tpu.ops.graph_conv import precompute_adjacency


def ring_topology(n_verts: int, batch: int = 1):
    """Two-ring graph: vertex i connected to i±1 (mod n) — the reference's synthetic
    refinement test graph (tests/test_layers.py:137-245)."""
    edges = np.stack([np.arange(n_verts), (np.arange(n_verts) + 1) % n_verts], axis=1)
    edges = np.sort(edges, axis=1)
    edges = np.unique(edges, axis=0)
    e = np.tile(edges[None], (batch, 1, 1)).astype(np.int32)
    mask = np.ones((batch, edges.shape[0]), dtype=bool)
    return (jnp.asarray(e), jnp.asarray(mask),
            precompute_adjacency(jnp.asarray(e), jnp.asarray(mask), n_verts))


def test_graphconv_golden():
    # reference: tests/test_layers.py:57-74 — weights forced to ones, adjacency
    # {0-1, 1-2}: out rows = [f0+f1+f2 ... ] pattern [15, 36, 33]
    feats = jnp.arange(9, dtype=jnp.float32).reshape(1, 3, 3)
    edges = jnp.asarray([[[0, 1], [1, 2]]], dtype=jnp.int32)
    mask = jnp.ones((1, 2), dtype=bool)
    topo = precompute_adjacency(edges, mask, 3)
    conv = GraphConv(6)
    params = conv.init(jax.random.PRNGKey(0), feats, topo)
    params = jax.tree_util.tree_map(jnp.ones_like, params)
    out = np.asarray(conv.apply(params, feats, topo))
    expected = np.tile(np.array([15.0, 36.0, 33.0])[None, :, None], (1, 1, 6))
    assert out.shape == (1, 3, 6)
    assert np.allclose(out, expected)


def test_res_graphconv_shapes():
    # reference: tests/test_layers.py:78-104
    feats = jnp.arange(9, dtype=jnp.float32).reshape(1, 3, 3)
    edges = jnp.asarray([[[0, 1], [1, 2]]], dtype=jnp.int32)
    mask = jnp.ones((1, 2), dtype=bool)
    topo = precompute_adjacency(edges, mask, 3)
    for out_dim in (3, 10):  # without and with projection
        conv = ResGraphConv(out_dim)
        params = conv.init(jax.random.PRNGKey(0), feats, topo)
        out = conv.apply(params, feats, topo)
        assert out.shape == (1, 3, out_dim)


def _pyramid(key, B):
    return [jax.random.normal(jax.random.fold_in(key, i), (B, s, s, c))
            for i, (s, c) in enumerate([(35, 256), (18, 512), (9, 1024), (5, 2048)])]


def test_refine_cells_two_ring():
    # reference: tests/test_layers.py:137-245 — all three cells on a 100-vertex ring
    key = jax.random.PRNGKey(0)
    B, V = 2, 100
    _, _, topo = ring_topology(V, batch=B)
    verts = jax.random.uniform(key, (B, V, 3), minval=1.0, maxval=30.0)
    fmaps = _pyramid(key, B)

    for cls, feat_arg in ((ResVertixRefineShapenet, fmaps),
                          (VertixRefineShapeNet, fmaps)):
        cell0 = cls(use_input_features=False, num_features=128)
        p0 = cell0.init(jax.random.PRNGKey(1), feat_arg, verts, topo, (137, 137))
        new_verts, feats = cell0.apply(p0, feat_arg, verts, topo, (137, 137))
        assert new_verts.shape == (B, V, 3)
        assert feats.shape == (B, V, 128)
        # positions move by at most tanh: |delta| <= 1
        assert np.abs(np.asarray(new_verts - verts)).max() <= 1.0 + 1e-5

        cell1 = cls(use_input_features=True, num_features=128)
        p1 = cell1.init(jax.random.PRNGKey(2), feat_arg, new_verts, topo,
                        (137, 137), feats)
        v2, f2 = cell1.apply(p1, feat_arg, new_verts, topo, (137, 137), feats)
        assert v2.shape == (B, V, 3) and f2.shape == (B, V, 128)

    roi = jax.random.normal(key, (B, 12, 12, 256))
    cell = VertixRefinePix3D(use_input_features=False, num_features=128)
    p = cell.init(jax.random.PRNGKey(3), roi, verts, topo, (137, 137))
    v, f = cell.apply(p, roi, verts, topo, (137, 137))
    assert v.shape == (B, V, 3) and f.shape == (B, V, 128)


def test_voxel_branch_shapes():
    # reference: tests/test_layers.py:108-114 — 2x10x64x64 -> 2x22x128x128
    branch = VoxelBranch(22)
    x = jnp.zeros((2, 64, 64, 10))
    params = branch.init(jax.random.PRNGKey(0), x)
    out = branch.apply(params, x)
    assert out.shape == (2, 128, 128, 22)  # NHWC; channels = depth axis
    o = np.asarray(out)
    assert (o > 0).all() and (o < 1).all()  # sigmoid output


def test_backbone_pyramid_shapes():
    # reference: tests/test_layers.py:117-134 — strides 4/8/16/32, widths x256..x2048
    model = ResNet50(num_classes=13)
    H = 64
    x = jnp.zeros((2, H, H, 3))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    logits, fmaps = model.apply(variables, x, train=False)
    assert logits.shape == (2, 13)
    assert len(fmaps) == 4
    for i, fm in enumerate(fmaps):
        mul = 2 ** (i + 2)
        assert fm.shape == (2, H // mul, H // mul, 64 * mul)


def test_project_first_matches_gather_first():
    """Project-then-align == gather-then-Dense with the SAME params (the no-bias
    projection commutes with bilinear sampling; PERFORMANCE.md round 3). Also
    pins checkpoint compatibility: one param pytree drives both dataflows."""
    import os
    key = jax.random.PRNGKey(5)
    B, V = 2, 64
    _, _, topo = ring_topology(V, batch=B)
    verts = jax.random.uniform(key, (B, V, 3), minval=1.0, maxval=30.0)
    fmaps = _pyramid(key, B)

    for cls in (ResVertixRefineShapenet, VertixRefineShapeNet):
        cell = cls(use_input_features=False, num_features=128)
        outs = {}
        grads = {}
        for flag in ("1", "0"):
            os.environ["MESHRCNN_PROJECT_FIRST"] = flag
            try:
                if "params" not in outs:
                    params = cell.init(jax.random.PRNGKey(1), fmaps, verts,
                                       topo, (137, 137))
                    outs["params"] = params
                v, f = cell.apply(outs["params"], fmaps, verts, topo, (137, 137))

                def loss(p):
                    v2, f2 = cell.apply(p, fmaps, verts, topo, (137, 137))
                    return jnp.sum(v2 ** 2) + jnp.sum(f2 ** 2)

                g = jax.grad(loss)(outs["params"])
                outs[flag] = (np.asarray(v), np.asarray(f))
                grads[flag] = g
            finally:
                os.environ.pop("MESHRCNN_PROJECT_FIRST", None)
        np.testing.assert_allclose(outs["1"][0], outs["0"][0], rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(outs["1"][1], outs["0"][1], rtol=2e-4, atol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(grads["1"]),
                        jax.tree_util.tree_leaves(grads["0"])):
            a, b = np.asarray(a), np.asarray(b)
            # float-association noise scales with the leaf's grad magnitude
            scale = max(np.abs(b).max(), 1.0)
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5 * scale)


def test_voxel_branch_saturation_keeps_gradients():
    """Round-5 freeze fix: the voxel head's soft-clamped sigmoid must (a) match
    the plain sigmoid to <1e-6 in the healthy |logit|<=5 range, and (b) keep a
    NONZERO voxel-BCE gradient at logits that saturate a plain f32 sigmoid to
    exactly 0/1 (where the clipped-log BCE gradient vanishes and the branch
    freezes permanently — observed on the Adam detection runs, PARITY.md r5)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from meshrcnn_tpu.models.layers import _soft_clamp_logits
    from meshrcnn_tpu.ops.losses import voxel_loss

    # (a) EXACT equality with the plain sigmoid in the meaningful range
    x = jnp.linspace(-8.0, 8.0, 101)
    soft = jax.nn.sigmoid(_soft_clamp_logits(x))
    plain = jax.nn.sigmoid(x)
    assert (np.asarray(soft) == np.asarray(plain)).all()
    # outputs stay strictly inside (0, 1) at any logit
    extreme = jax.nn.sigmoid(_soft_clamp_logits(jnp.asarray([1e4, -1e4])))
    assert 0.0 < float(extreme[1]) and float(extreme[0]) < 1.0

    # (b) gradient survives extreme saturation; the plain path's dies
    big = jnp.asarray([40.0, -100.0, 25.0])
    tgt = jnp.asarray([0.0, 1.0, 0.0])  # wrong predictions at saturation

    def loss_soft(logits):
        return voxel_loss(jax.nn.sigmoid(_soft_clamp_logits(logits)), tgt)

    def loss_plain(logits):
        return voxel_loss(jax.nn.sigmoid(logits), tgt)

    g_soft = np.asarray(jax.grad(loss_soft)(big))
    g_plain = np.asarray(jax.grad(loss_plain)(big))
    assert (np.abs(g_soft) > 1e-6).all(), g_soft      # alive everywhere
    assert (g_plain == 0.0).all(), g_plain            # the failure being fixed
