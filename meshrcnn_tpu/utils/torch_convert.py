"""Convert torchvision-style PyTorch state dicts to this framework's flax params.

The reference initialises its backbones from the torchvision model zoo
(reference: shapenet_model.py:139-150 pretrained_ResNet50,
pix3d_model.py:163-178 pretrained_MaskRcnn). This module provides the equivalent
capability for the TPU build: given a ``.pth``/``.pt`` state dict (already
downloaded — this environment has no egress), remap names and transpose layouts
into the flax parameter tree of ``models.resnet.ResNet50``:

  torch conv  [O, I, kh, kw]  ->  flax kernel [kh, kw, I, O]
  torch linear [O, I]         ->  flax kernel [I, O]
  torch BN weight/bias/running_mean/running_var -> scale/bias + batch_stats

Layer naming: torchvision ``layer{i}.{j}.conv1`` -> flax ``layer{i}_{j}/conv1``;
``downsample.0/1`` -> ``downsample_conv``/``downsample_bn``.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _t2n(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def convert_resnet50(state_dict: Dict[str, Any], num_classes: int | None = None
                     ) -> Tuple[dict, dict]:
    """Map a torchvision ResNet-50 state dict to (params, batch_stats) pytrees.

    If num_classes differs from the checkpoint's fc shape (e.g. ImageNet 1000 vs
    ShapeNet 13), the fc head is dropped — matching the reference's head swap at
    shapenet_model.py:147-149 — and the caller keeps its fresh init for fc.
    """
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def conv_kernel(name):
        return np.transpose(_t2n(state_dict[name]), (2, 3, 1, 0))

    def bn(prefix, flax_name, scope_params, scope_stats):
        put(scope_params, (flax_name, "scale"), _t2n(state_dict[prefix + ".weight"]))
        put(scope_params, (flax_name, "bias"), _t2n(state_dict[prefix + ".bias"]))
        put(scope_stats, (flax_name, "mean"), _t2n(state_dict[prefix + ".running_mean"]))
        put(scope_stats, (flax_name, "var"), _t2n(state_dict[prefix + ".running_var"]))

    put(params, ("conv1", "kernel"), conv_kernel("conv1.weight"))
    bn("bn1", "bn1", params, stats)

    stage_sizes = (3, 4, 6, 3)
    for i, blocks in enumerate(stage_sizes, start=1):
        for j in range(blocks):
            t_pref = f"layer{i}.{j}"
            f_name = f"layer{i}_{j}"
            blk_p: dict = {}
            blk_s: dict = {}
            for c in ("conv1", "conv2", "conv3"):
                put(blk_p, (c, "kernel"), conv_kernel(f"{t_pref}.{c}.weight"))
            for b in ("bn1", "bn2", "bn3"):
                bn(f"{t_pref}.{b}", b, blk_p, blk_s)
            if f"{t_pref}.downsample.0.weight" in state_dict:
                put(blk_p, ("downsample_conv", "kernel"),
                    conv_kernel(f"{t_pref}.downsample.0.weight"))
                bn(f"{t_pref}.downsample.1", "downsample_bn", blk_p, blk_s)
            params[f_name] = blk_p
            stats[f_name] = blk_s

    if "fc.weight" in state_dict:
        w = _t2n(state_dict["fc.weight"])
        if num_classes is None or w.shape[0] == num_classes:
            params["fc"] = {"kernel": w.T, "bias": _t2n(state_dict["fc.bias"])}
    return params, stats


def load_pretrained_resnet50(path: str, num_classes: int = 13) -> Tuple[dict, dict]:
    """Load a torchvision resnet50 .pth and return (params, batch_stats).

    Reference-equivalent of pretrained_ResNet50 (shapenet_model.py:139-150) minus
    the download: point it at a local checkpoint file.
    """
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_resnet50(sd, num_classes=num_classes)


def convert_maskrcnn(state_dict: Dict[str, Any], num_classes: int | None = None,
                     box_pool: int | None = 12) -> Tuple[dict, dict]:
    """Map a torchvision maskrcnn_resnet50_fpn state dict to this framework's
    Pix3DMaskRCNN parameter tree (reference-equivalent of pretrained_MaskRcnn,
    pix3d_model.py:163-178, minus the download).

    Converts: ResNet body (backbone.body.*), FPN laterals/outputs
    (backbone.fpn.inner/layer_blocks.*), RPN head, box TwoMLPHead + predictor and
    the mask head. Heads whose class count differs from ``num_classes`` (COCO 91
    vs Pix3D 10) are dropped, matching the reference's head swap.
    """
    body = {k[len("backbone.body."):]: v for k, v in state_dict.items()
            if k.startswith("backbone.body.")}
    res_p, res_s = convert_resnet50(body)

    params: dict = {"backbone": res_p}
    stats: dict = {"backbone": res_s}

    def conv(name):
        return np.transpose(_t2n(state_dict[name + ".weight"]), (2, 3, 1, 0))

    def conv_b(name):
        return {"kernel": conv(name), "bias": _t2n(state_dict[name + ".bias"])}

    def dense(name):
        return {"kernel": _t2n(state_dict[name + ".weight"]).T,
                "bias": _t2n(state_dict[name + ".bias"])}

    # FPN: torchvision inner_blocks (1x1 laterals) and layer_blocks (3x3 outs)
    for i in range(4):
        params["backbone"][f"lateral{i + 2}"] = conv_b(f"backbone.fpn.inner_blocks.{i}")
        params["backbone"][f"out{i + 2}"] = conv_b(f"backbone.fpn.layer_blocks.{i}")

    # RPN head
    params["rpn_head"] = {
        "conv": conv_b("rpn.head.conv"),
        "cls_logits": conv_b("rpn.head.cls_logits"),
        "bbox_pred": conv_b("rpn.head.bbox_pred"),
    }

    roi: dict = {}
    # fc6 consumes the FLATTENED pooled RoI map; torch flattens NCHW (C,H,W)
    # while the flax TwoMLPHead flattens NHWC (H,W,C) — permute the kernel's
    # input ordering or the converted head computes garbage (caught by
    # tests/test_convert.py forward-activation parity).
    fc6_w = _t2n(state_dict["roi_heads.box_head.fc6.weight"])   # [rep, C*H*W]
    chans = 256
    if "roi_heads.mask_head.mask_fcn1.weight" in state_dict:
        chans = _t2n(state_dict["roi_heads.mask_head.mask_fcn1.weight"]).shape[1]
    hw = fc6_w.shape[1] // chans
    side = int(round(hw ** 0.5))
    if box_pool is None or side == box_pool:
        fc6_k = (fc6_w.reshape(-1, chans, side, side)
                 .transpose(0, 2, 3, 1).reshape(fc6_w.shape[0], -1).T)
        roi["box_head"] = {"fc6": {"kernel": fc6_k,
                                   "bias": _t2n(state_dict["roi_heads.box_head.fc6.bias"])},
                           "fc7": dense("roi_heads.box_head.fc7")}
    # else: drop — the reference swaps the whole RoI head for a fresh 12x12-pool
    # one (pix3d_model.py:172-176), so COCO's 7x7 box head never survives.
    cls_w = _t2n(state_dict["roi_heads.box_predictor.cls_score.weight"])
    if num_classes is None or cls_w.shape[0] == num_classes:
        roi["box_predictor"] = {
            "cls_score": dense("roi_heads.box_predictor.cls_score"),
            "bbox_pred": dense("roi_heads.box_predictor.bbox_pred")}
    mask = {}
    for i in range(1, 5):
        mask[f"mask_fcn{i}"] = conv_b(f"roi_heads.mask_head.mask_fcn{i}")
    # torchvision ConvTranspose2d weight is [in, out, kh, kw] -> flax [kh, kw, in, out]
    w5 = _t2n(state_dict["roi_heads.mask_predictor.conv5_mask.weight"])
    mask["conv5_mask"] = {"kernel": np.transpose(w5, (2, 3, 0, 1)),
                          "bias": _t2n(state_dict["roi_heads.mask_predictor.conv5_mask.bias"])}
    logits_w = _t2n(state_dict["roi_heads.mask_predictor.mask_fcn_logits.weight"])
    if num_classes is None or logits_w.shape[0] == num_classes:
        mask["mask_fcn_logits"] = conv_b("roi_heads.mask_predictor.mask_fcn_logits")
    roi["mask_head"] = mask
    params["roi_heads"] = roi
    return params, stats


def load_pretrained_maskrcnn(path: str, num_classes: int = 10) -> Tuple[dict, dict]:
    """Load a torchvision maskrcnn_resnet50_fpn_coco .pth -> (params, batch_stats)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_maskrcnn(sd, num_classes=num_classes)


def merge_backbone_params(state, backbone_params: dict, backbone_stats: dict,
                          prefix: str = "backbone"):
    """Graft converted backbone params into a TrainState, keeping other params.

    Missing leaves (e.g. a swapped fc head) keep their fresh initialisation.
    Never calls device_get on the existing tree — only shapes/dtypes are read
    (pulling ~100MB of params over a tunneled device takes minutes), and the new
    host arrays transfer device-ward lazily on first use.
    """
    def merge(dst: dict, src: dict) -> dict:
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                out[k] = merge(dst[k], v)
            elif k in dst:
                expect = dst[k]
                got = np.asarray(v, dtype=np.dtype(expect.dtype))
                if tuple(expect.shape) != got.shape:
                    raise ValueError(f"shape mismatch for {k}: "
                                     f"{tuple(expect.shape)} vs {got.shape}")
                out[k] = got
        return out

    params = dict(state.params)
    stats = dict(state.batch_stats)
    params[prefix] = merge(params[prefix], backbone_params)
    stats[prefix] = merge(stats[prefix], backbone_stats)
    return state.replace(params=params, batch_stats=stats)
