"""Flax modules for graph convolution and vertex refinement cells.

Rebuilds the reference layer library (reference: meshRCNN/layers.py:25-339) against
the padded MeshBatch representation: features are [B, Vmax, C] dense blocks (MXU
matmuls), neighbour sums are masked segment-sums over [B, Emax, 2] edge lists
(ops/graph_conv.py), and vert-align is the batched bilinear gather (ops/vert_align.py).
Weight shapes and the dataflow of every cell match the reference exactly so converted
checkpoints are drop-in.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from meshrcnn_tpu.ops.graph_conv import aggregate_neighbours
from meshrcnn_tpu.ops.vert_align import vert_align


def _fan_in_uniform(key, shape, dtype=jnp.float32):
    """uniform(-1/sqrt(fan_in), +1/sqrt(fan_in)) — reference GraphConv init
    (meshRCNN/layers.py:42-45)."""
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class GraphConv(nn.Module):
    """f'_i = ReLU(W0 f_i + sum_{j in N(i)} W1 f_j)  (reference: layers.py:25-68)."""

    out_features: int

    @nn.compact
    def __call__(self, feats: jnp.ndarray, topo) -> jnp.ndarray:
        in_features = feats.shape[-1]
        w0 = self.param("w0", _fan_in_uniform, (in_features, self.out_features))
        w1 = self.param("w1", _fan_in_uniform, (in_features, self.out_features))
        own = jnp.einsum("bvc,co->bvo", feats, w0)
        prop = jnp.einsum("bvc,co->bvo", feats, w1)
        neigh = aggregate_neighbours(prop, topo)
        return nn.relu(own + neigh)


class ResGraphConv(nn.Module):
    """Two GraphConvs + linear-projection skip when dims differ
    (reference: layers.py:71-100)."""

    out_features: int

    @nn.compact
    def __call__(self, feats: jnp.ndarray, topo) -> jnp.ndarray:
        in_features = feats.shape[-1]
        if in_features != self.out_features:
            skip = nn.Dense(self.out_features, use_bias=False, name="projection")(feats)
        else:
            skip = feats
        out = GraphConv(self.out_features, name="conv0")(feats, topo)
        out = GraphConv(self.out_features, name="conv1")(out, topo)
        return skip + out


class _LevelProjector(nn.Module):
    """One [sum(C_l), F] no-bias kernel applied level-wise to a feature-map list.

    Parameter path and shape are IDENTICAL to ``nn.Dense(F, use_bias=False)``
    applied to the channel-concat of the gathered levels (kernel [total, F],
    lecun_normal init), so checkpoints are interchangeable between the two
    dataflows. Because the projection has no bias and bilinear sampling is
    linear, ``Dense(vert_align(maps, concat))`` == ``vert_align(maps @ W_l
    slices, sum)`` exactly (up to float association) — but projecting the MAPS
    first costs ~sum(Hf*Wf*C_l)*F MACs (~0.16 GFLOP for the ShapeNet pyramid)
    instead of V*total*F (~8 GFLOP at V=8192), gathers 30x fewer channels, and
    never materialises the [B, V, 3840] tensor whose storage for the Dense
    backward dominated train-step memory (B=12 OOM'd a 16 GB chip before this;
    PERFORMANCE.md round 3).
    """

    features: int

    @nn.compact
    def __call__(self, feature_maps: Sequence[jnp.ndarray]):
        total = sum(fm.shape[-1] for fm in feature_maps)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (total, self.features))
        outs, off = [], 0
        for fm in feature_maps:
            c = fm.shape[-1]
            outs.append(jnp.einsum("bhwc,cf->bhwf", fm, kernel[off:off + c]))
            off += c
        return outs


def _project_align(feature_maps, verts, image_size, features: int, name: str):
    """Env-gated projection+alignment (A/B: MESHRCNN_PROJECT_FIRST=0 restores
    the reference-ordered gather-then-Dense dataflow; params identical)."""
    import os
    if os.environ.get("MESHRCNN_PROJECT_FIRST", "1") == "1":
        projected_maps = _LevelProjector(features, name=name)(feature_maps)
        return vert_align(projected_maps, verts, image_size, combine="sum")
    aligned = vert_align(feature_maps, verts, image_size)
    return nn.Dense(features, use_bias=False, name=name)(aligned)


class ResVertixRefineShapenet(nn.Module):
    """Residual ShapeNet refinement cell (reference: layers.py:103-178).

    VertAlign -> Dense(alignment->num_features) -> concat[feats?, pos, projected]
    -> 3x ResGraphConv -> GraphConv(->3) -> tanh -> additive position update.
    (The VertAlign/Dense pair runs project-then-align — see _LevelProjector.)
    """

    use_input_features: bool = True
    num_features: int = 128
    ndims: int = 3

    @nn.compact
    def __call__(self, feature_maps: Sequence[jnp.ndarray], verts: jnp.ndarray,
                 topo, image_size: tuple[int, int],
                 vert_feats: Optional[jnp.ndarray] = None):
        projected = _project_align(feature_maps, verts, image_size,
                                   self.num_features, "linear")
        parts = [verts, projected]
        if vert_feats is not None:
            assert self.use_input_features
            parts = [vert_feats] + parts
        else:
            assert not self.use_input_features
        feats = jnp.concatenate(parts, axis=-1)
        feats = ResGraphConv(self.num_features, name="resGraphConv0")(feats, topo)
        feats = ResGraphConv(self.num_features, name="resGraphConv1")(feats, topo)
        feats = ResGraphConv(self.num_features, name="resGraphConv2")(feats, topo)
        offset = GraphConv(self.ndims, name="graphConv")(feats, topo)
        new_verts = verts + jnp.tanh(offset)
        return new_verts, feats


class VertixRefineShapeNet(nn.Module):
    """Non-residual ShapeNet refinement cell (reference: layers.py:181-259).

    Positions are re-concatenated before convs 1 and 2 (layers.py:246-252);
    the position offset is Dense(num_features->3)+tanh (layers.py:255-257).
    """

    use_input_features: bool = True
    num_features: int = 128
    ndims: int = 3

    @nn.compact
    def __call__(self, feature_maps: Sequence[jnp.ndarray], verts: jnp.ndarray,
                 topo, image_size: tuple[int, int],
                 vert_feats: Optional[jnp.ndarray] = None):
        projected = _project_align(feature_maps, verts, image_size,
                                   self.num_features, "linear0")
        parts = [verts, projected]
        if vert_feats is not None:
            assert self.use_input_features
            parts = [vert_feats] + parts
        else:
            assert not self.use_input_features
        feats = jnp.concatenate(parts, axis=-1)
        feats = GraphConv(self.num_features, name="graphConv0")(feats, topo)
        feats = jnp.concatenate([verts, feats], axis=-1)
        feats = GraphConv(self.num_features, name="graphConv1")(feats, topo)
        feats = jnp.concatenate([verts, feats], axis=-1)
        feats = GraphConv(self.num_features, name="graphConv2")(feats, topo)
        offset = nn.Dense(self.ndims, use_bias=False, name="linear1")(feats)
        new_verts = verts + jnp.tanh(offset)
        return new_verts, feats


class VertixRefinePix3D(nn.Module):
    """Pix3D refinement cell (reference: layers.py:262-339).

    Pools from a single RoI feature map (alignment_size=256); the final position
    offset is Dense on concat[pos, feats] (num_features+3 -> 3, layers.py:333-335).
    """

    use_input_features: bool = True
    num_features: int = 128
    ndims: int = 3

    @nn.compact
    def __call__(self, roi_features: jnp.ndarray, verts: jnp.ndarray,
                 topo, image_size: tuple[int, int],
                 vert_feats: Optional[jnp.ndarray] = None):
        aligned = vert_align([roi_features], verts, image_size)
        parts = [verts, aligned]
        if vert_feats is not None:
            assert self.use_input_features
            parts = [vert_feats] + parts
        else:
            assert not self.use_input_features
        feats = jnp.concatenate(parts, axis=-1)
        feats = GraphConv(self.num_features, name="graphConv0")(feats, topo)
        feats = jnp.concatenate([verts, feats], axis=-1)
        feats = GraphConv(self.num_features, name="graphConv1")(feats, topo)
        feats = jnp.concatenate([verts, feats], axis=-1)
        feats = GraphConv(self.num_features, name="graphConv2")(feats, topo)
        pos_in = jnp.concatenate([verts, feats], axis=-1)
        offset = nn.Dense(self.ndims, use_bias=False, name="linear")(pos_in)
        new_verts = verts + jnp.tanh(offset)
        return new_verts, feats


class VoxelBranch(nn.Module):
    """Fully-convolutional occupancy head (reference: layers.py:487-506).

    Conv3x3 -> Conv3x3 -> ConvTranspose(x2) -> Conv1x1 -> sigmoid. NHWC in/out;
    the output channel axis doubles as the depth (z) axis of the V^3 grid. The
    reference stacks these without intermediate activations — reproduced verbatim,
    except the final logit passes through a SMOOTH soft-clamp before the
    sigmoid: identity for |x| <= 8, then sign(x)*(8 + 7*tanh((|x|-8)/7)) easing
    to +-15. Rationale (round-5 freeze diagnosis, PARITY.md): plain f32 sigmoid
    returns EXACTLY 0/1 once |logit| exceeds ~17/88, the BCE's probability
    clamp then has zero gradient, and the whole branch freezes permanently —
    observed in-anger on the Adam detection runs (constant saturated grids
    bit-identical across 12 further training epochs; the reference's
    sigmoid+BCELoss has the identical failure mode). The soft-clamp keeps
    probabilities inside (3e-7, 1-3e-7) — still representable in f32 — with a
    never-zero, C1-continuous gradient; it is EXACTLY the plain sigmoid for
    |logit| <= 8 (probabilities 0.0003..0.9997, the entire meaningful range;
    pytest-pinned), so healthy training is bit-identical.
    """

    out_channels: int
    hidden_channels: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from meshrcnn_tpu.utils.shapes import conv_output, convT_output

        h, w = int(x.shape[1]), int(x.shape[2])
        x = nn.Conv(self.hidden_channels, (3, 3), padding=1, name="conv0")(x)
        x = nn.Conv(self.hidden_channels, (3, 3), padding=1, name="conv1")(x)
        assert (int(x.shape[1]), int(x.shape[2])) == conv_output(
            *conv_output(h, w, kernel=3, padding=1), kernel=3, padding=1)
        x = nn.ConvTranspose(self.hidden_channels, (2, 2), strides=(2, 2), name="deconv")(x)
        # x2 upsample: the N x C x V/2 x V/2 -> N x out x V x V contract
        # (reference: layers.py:487-506, sized with utils.py:24-38 convT_output)
        assert (int(x.shape[1]), int(x.shape[2])) == convT_output(
            h, w, kernel=2, stride=2)
        x = nn.Conv(self.out_channels, (1, 1), name="conv2")(x)
        return nn.sigmoid(_soft_clamp_logits(x))


def _soft_clamp_logits(x: jnp.ndarray, a: float = 8.0, b: float = 15.0
                       ) -> jnp.ndarray:
    """Identity for |x| <= a; rational easing a + (b-a)*t/(1+t) toward +-b
    beyond (t = (|x|-a)/(b-a); C1 at the knee, derivative 1/(1+t)^2 decays
    POLYNOMIALLY so it never underflows to f32 zero — a tanh easing's sech^2
    gradient flushes to 0 by |x| ~ 100, recreating the freeze this exists to
    prevent). See VoxelBranch docstring for why."""
    ax = jnp.abs(x)
    # max(.., 0) keeps t >= 0 so the unselected branch can never produce the
    # NaN (t = -1 division) that jnp.where would leak into gradients
    t = jnp.maximum(ax - a, 0.0) / (b - a)
    eased = a + (b - a) * t / (1.0 + t)
    return jnp.where(ax <= a, x, jnp.sign(x) * eased)
