"""VertexAlign: perceptual feature pooling (Pixel2Mesh) on padded vertex buffers.

TPU-native redesign of the reference VertexAlign (reference: meshRCNN/layers.py:509-613).
The reference loops over meshes in Python (538-543) and gathers map corners with
*integer* interpolation weights (592-611) — on equal floor/ceil coordinates the four
weights are all zero, so its "bilinear" degenerates to a masked floor lookup. Here the
projection and a true fractional bilinear gather run as one batched XLA program over
[B, Vmax, 3] padded positions; padded rows produce values that downstream masks kill.

Camera intrinsics match the reference exactly (layers.py:557-558):
    h = 248 * Y / Z + 111.5
    w = 248 * X / (-Z) + 111.5
clamped to the image size. X, Y, Z are vertex position columns 0, 1, 2 (which, after
cubify's axis rotation, hold (z_vox, x_vox, -y_vox)).

Deviation from the reference, by design (SURVEY.md §6: reproduce the API, flag bugs):
  * true bilinear weights (fractional) instead of integer-truncated ones;
  * features are indexed (row=h-derived, col=w-derived); the reference flips axes
    (layers.py:587: ``img_feat[:, x1, y1]``), which only "works" because its inputs
    are square and its backbone is trained against the flipped convention.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def project_verts(verts: jnp.ndarray, image_size: tuple[int, int],
                  focal: float = 248.0, center: float = 111.5) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Camera projection of [..., 3] positions to (h, w) pixel coords, clamped."""
    X, Y, Z = verts[..., 0], verts[..., 1], verts[..., 2]
    safe_z = jnp.where(jnp.abs(Z) < 1e-6, 1e-6, Z)
    h = focal * (Y / safe_z) + center
    w = focal * (X / -safe_z) + center
    H, W = image_size
    h = jnp.clip(h, 0.0, H - 1)
    w = jnp.clip(w, 0.0, W - 1)
    return h, w


def _bilinear_sample_batched(fmap: jnp.ndarray, rows: jnp.ndarray,
                             cols: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of fmap [B, Hf, Wf, C] at fractional (rows, cols) [B, V].

    The four corner reads are flattened global-index gathers over [B*Hf*Wf, C]
    — vmapped (batched-dimension) gathers hit an XLA-TPU slow path (see
    ops/gather.py), so the batch offset is folded into the index instead.
    """
    B, Hf, Wf, C = fmap.shape
    r0 = jnp.floor(rows)
    c0 = jnp.floor(cols)
    fr = rows - r0
    fc = cols - c0
    r0i = r0.astype(jnp.int32)
    c0i = c0.astype(jnp.int32)
    r1i = jnp.minimum(r0i + 1, Hf - 1)
    c1i = jnp.minimum(c0i + 1, Wf - 1)
    # corner reads through take_rows_mxu: forward is the same flattened
    # global-index gather; the BACKWARD becomes a one-hot MXU segment sum
    # instead of XLA's serialized scatter-add into the feature map (profiled
    # ~9 ms/step across the refinement stages, PERFORMANCE.md round 3)
    from meshrcnn_tpu.ops.gather import take_rows_mxu
    fm_rows = fmap.reshape(B, Hf * Wf, C)

    def g(r, c):
        return take_rows_mxu(fm_rows, r * Wf + c)

    out = (g(r0i, c0i) * ((1 - fr) * (1 - fc))[..., None]
           + g(r0i, c1i) * ((1 - fr) * fc)[..., None]
           + g(r1i, c0i) * (fr * (1 - fc))[..., None]
           + g(r1i, c1i) * (fr * fc)[..., None])
    return out


def vert_align(feature_maps: Sequence[jnp.ndarray], verts: jnp.ndarray,
               image_size: tuple[int, int], combine: str = "concat") -> jnp.ndarray:
    """Pool image features at projected vertex locations.

    Args:
      feature_maps: list of [B, Hf, Wf, C_l] NHWC feature maps (e.g. ResNet C2..C5
        giving sum(C_l) = 3840 for ShapeNet, or one [B, 12, 12, 256] RoI map for Pix3D).
      verts: [B, Vmax, 3] padded vertex positions.
      image_size: (H, W) of the original image.
      combine: "concat" channels across levels (reference semantics), or "sum"
        them (requires equal C_l) — the latter serves the project-then-align
        refinement cells, where each level has already been projected to the
        cell width and Dense(concat) == sum of per-level projections.

    Returns:
      [B, Vmax, sum(C_l)] ("concat") or [B, Vmax, C] ("sum") pooled features
      (padded rows contain junk; mask downstream).
    """
    h, w = project_verts(verts, image_size)       # [B, V] each
    H, W = image_size
    feats = []
    for fm in feature_maps:
        Hf, Wf = fm.shape[1:3]
        # scale image-space coords to this pyramid level (layers.py:577-578)
        rows = jnp.clip(h / (float(H) / Hf), 0.0, Hf - 1)
        cols = jnp.clip(w / (float(W) / Wf), 0.0, Wf - 1)
        feats.append(_bilinear_sample_batched(fm, rows, cols))
    if combine == "sum":
        out = feats[0]
        for f in feats[1:]:
            out = out + f
        return out
    return jnp.concatenate(feats, axis=-1)
