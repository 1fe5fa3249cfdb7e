"""ResNet-50 FPN backbone (flax), the Pix3D detection trunk.

TPU-native equivalent of torchvision's ``resnet_fpn_backbone('resnet50')`` used by
the reference Mask R-CNN (reference: pix3d_model.py:122). Produces the P2..P5
pyramid (256 channels, strides 4/8/16/32) plus the RPN-only P6 max-pool level,
NHWC layout throughout.
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp
from flax import linen as nn

from meshrcnn_tpu.models.resnet import Bottleneck


class ResNetFPN(nn.Module):
    out_channels: int = 256
    stage_sizes: tuple = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32  # conv compute dtype (bf16 on TPU); BN stays f32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False
                 ) -> List[jnp.ndarray]:
        # ---- ResNet-50 body (same structure as models.resnet.ResNet50) ----
        from functools import partial
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
        conv = partial(nn.Conv, dtype=self.dtype)
        x = conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                 name="conv1")(images)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        laterals = []
        for i, (blocks, feats) in enumerate(zip(self.stage_sizes, (64, 128, 256, 512))):
            for j in range(blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                x = Bottleneck(feats, strides=strides, dtype=self.dtype,
                               name=f"layer{i + 1}_{j}")(x, train)
            laterals.append(x)

        # ---- FPN: lateral 1x1 + top-down nearest upsample + output 3x3 ----
        c2, c3, c4, c5 = laterals
        p5 = conv(self.out_channels, (1, 1), name="lateral5")(c5)
        p4 = conv(self.out_channels, (1, 1), name="lateral4")(c4) + _upsample2(p5, c4.shape)
        p3 = conv(self.out_channels, (1, 1), name="lateral3")(c3) + _upsample2(p4, c3.shape)
        p2 = conv(self.out_channels, (1, 1), name="lateral2")(c2) + _upsample2(p3, c2.shape)
        p2 = conv(self.out_channels, (3, 3), padding=1, name="out2")(p2)
        p3 = conv(self.out_channels, (3, 3), padding=1, name="out3")(p3)
        p4 = conv(self.out_channels, (3, 3), padding=1, name="out4")(p4)
        p5 = conv(self.out_channels, (3, 3), padding=1, name="out5")(p5)
        # LastLevelMaxPool for the RPN (torchvision convention)
        p6 = nn.max_pool(p5, (1, 1), strides=(2, 2))
        return [p2, p3, p4, p5, p6]


def _upsample2(x: jnp.ndarray, target_shape) -> jnp.ndarray:
    """Nearest-neighbour upsample of NHWC x to the target spatial shape."""
    B, H, W, C = x.shape
    th, tw = target_shape[1], target_shape[2]
    rows = (jnp.arange(th) * H) // th
    cols = (jnp.arange(tw) * W) // tw
    return x[:, rows][:, :, cols]
