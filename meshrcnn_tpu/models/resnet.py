"""Flax ResNet-50 backbone returning classification output + the C2..C5 pyramid.

TPU-native equivalent of the reference's torchvision-subclassed backbone
(reference: meshRCNN/shapenet_model.py:104-150): forward returns
(logits, probs, [c2, c3, c4, c5]) where the feature maps are NHWC with channel
counts 256/512/1024/2048 at strides 4/8/16/32 — the inputs to VertexAlign and
the voxel branch. Runs in bfloat16-friendly NHWC layout for the MXU.

Note (SURVEY.md §6): the reference applies NLL loss to *softmax* outputs
(shapenet_model.py:130-134), a degenerate constant-gradient combination. We expose
logits so the harness can use a proper softmax cross-entropy, plus the softmax
probs for behavioural parity of the eval surface.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class Bottleneck(nn.Module):
    """torchvision-style bottleneck (1x1 -> 3x3(stride) -> 1x1 x4) with BN.

    ``dtype`` is the conv compute dtype (bfloat16 on TPU halves MXU time);
    batch-norm statistics and parameters stay float32 (classic mixed precision).
    """

    features: int
    strides: int = 1
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        residual = x
        y = conv(self.features, (1, 1), name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.features, (3, 3), strides=(self.strides, self.strides),
                 padding=1, name="conv2")(y)
        y = norm(name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.features * self.expansion, (1, 1), name="conv3")(y)
        y = norm(name="bn3")(y)
        if residual.shape[-1] != self.features * self.expansion or self.strides != 1:
            residual = conv(self.features * self.expansion, (1, 1),
                            strides=(self.strides, self.strides),
                            name="downsample_conv")(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """ResNet-50; returns (logits [B, num_classes], [c2, c3, c4, c5] NHWC)."""

    num_classes: int = 13
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(images)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feature_maps = []
        for i, (blocks, feats) in enumerate(zip(self.stage_sizes, (64, 128, 256, 512))):
            for j in range(blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                x = Bottleneck(feats, strides=strides, dtype=self.dtype,
                               name=f"layer{i + 1}_{j}")(x, train)
            feature_maps.append(x.astype(jnp.float32))

        pooled = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_classes, name="fc")(pooled)
        return logits, feature_maps
