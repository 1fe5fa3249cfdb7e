"""Image resizing helpers matching torch interpolate semantics."""
from __future__ import annotations

import jax.numpy as jnp


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with align_corners=True, NHWC input.

    Matches ``F.interpolate(..., mode='bilinear', align_corners=True)`` used on the
    C5 map before the voxel branch (reference: meshRCNN/shapenet_model.py:51-52,
    scale_factor=4.8: 5x5 -> 24x24). jax.image.resize implements the half-pixel
    convention, so the align-corners grid is built explicitly here.
    """
    B, H, W, C = x.shape
    out_h, out_w = out_hw

    def grid(in_size: int, out_size: int) -> jnp.ndarray:
        if out_size == 1:
            return jnp.zeros((1,), dtype=jnp.float32)
        scale = (in_size - 1) / (out_size - 1)
        return jnp.arange(out_size, dtype=jnp.float32) * scale

    rows = grid(H, out_h)
    cols = grid(W, out_w)
    r0 = jnp.floor(rows).astype(jnp.int32)
    c0 = jnp.floor(cols).astype(jnp.int32)
    r1 = jnp.minimum(r0 + 1, H - 1)
    c1 = jnp.minimum(c0 + 1, W - 1)
    fr = (rows - r0.astype(jnp.float32))[None, :, None, None]
    fc = (cols - c0.astype(jnp.float32))[None, None, :, None]

    top = x[:, r0][:, :, c0] * (1 - fc) + x[:, r0][:, :, c1] * fc
    bot = x[:, r1][:, :, c0] * (1 - fc) + x[:, r1][:, :, c1] * fc
    return top * (1 - fr) + bot * fr


def scaled_size(in_size: int, scale_factor: float) -> int:
    """torch interpolate output-size rule: floor(in * scale)."""
    return int(in_size * scale_factor)
