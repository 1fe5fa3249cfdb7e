"""Torch->flax weight conversion test: build a torchvision-style ResNet-50 state
dict with torch (CPU), convert, and check the flax apply accepts it and that conv
weights actually landed (not just shapes)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from meshrcnn_tpu.models.resnet import ResNet50
from meshrcnn_tpu.utils.torch_convert import convert_resnet50


def build_torch_style_state_dict(num_classes=1000, seed=0):
    """Minimal torchvision-resnet50-shaped state dict (no torchvision needed)."""
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = torch.randn(o, i, k, k, generator=g) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = torch.rand(c, generator=g) + 0.5
        sd[name + ".bias"] = torch.randn(c, generator=g) * 0.1
        sd[name + ".running_mean"] = torch.randn(c, generator=g) * 0.1
        sd[name + ".running_var"] = torch.rand(c, generator=g) + 0.5

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    stage_sizes = (3, 4, 6, 3)
    widths = (64, 128, 256, 512)
    in_c = 64
    for i, (blocks, w) in enumerate(zip(stage_sizes, widths), start=1):
        for j in range(blocks):
            pref = f"layer{i}.{j}"
            conv(f"{pref}.conv1", w, in_c, 1)
            bn(f"{pref}.bn1", w)
            conv(f"{pref}.conv2", w, w, 3)
            bn(f"{pref}.bn2", w)
            conv(f"{pref}.conv3", w * 4, w, 1)
            bn(f"{pref}.bn3", w * 4)
            if j == 0:
                conv(f"{pref}.downsample.0", w * 4, in_c, 1)
                bn(f"{pref}.downsample.1", w * 4)
            in_c = w * 4
    sd["fc.weight"] = torch.randn(num_classes, 2048, generator=g) * 0.01
    sd["fc.bias"] = torch.zeros(num_classes)
    return sd


def test_convert_resnet50_into_flax():
    sd = build_torch_style_state_dict()
    params, stats = convert_resnet50(sd, num_classes=13)  # fc dropped (1000 != 13)
    assert "fc" not in params
    assert params["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert np.allclose(params["conv1"]["kernel"][:, :, 0, 0],
                       sd["conv1.weight"][0, 0].numpy())

    model = ResNet50(num_classes=13)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    fresh_p = jax.device_get(variables["params"])
    fresh_s = jax.device_get(variables["batch_stats"])

    # converted trees must be structural subsets with matching shapes
    def check_subset(dst, src, path=""):
        for k, v in src.items():
            assert k in dst, f"missing {path}/{k} in flax params"
            if isinstance(v, dict):
                check_subset(dst[k], v, path + "/" + k)
            else:
                assert np.asarray(dst[k]).shape == np.asarray(v).shape, path + "/" + k
                dst[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)

    check_subset(fresh_p, params)
    check_subset(fresh_s, stats)

    # forward runs with converted weights and produces distinct features
    logits, fmaps = model.apply({"params": fresh_p, "batch_stats": fresh_s},
                                jnp.ones((1, 64, 64, 3)), train=False)
    assert logits.shape == (1, 13)
    assert np.isfinite(np.asarray(logits)).all()
    assert fmaps[-1].shape[-1] == 2048


def build_torch_style_maskrcnn_sd(num_classes=91, seed=0):
    """Minimal torchvision maskrcnn_resnet50_fpn-shaped state dict."""
    g = torch.Generator().manual_seed(seed)
    sd = {}
    body = build_torch_style_state_dict(seed=seed)
    body.pop("fc.weight"); body.pop("fc.bias")
    for k, v in body.items():
        sd["backbone.body." + k] = v

    def conv_b(name, o, i, k):
        sd[name + ".weight"] = torch.randn(o, i, k, k, generator=g) * 0.05
        sd[name + ".bias"] = torch.zeros(o)

    def dense(name, o, i):
        sd[name + ".weight"] = torch.randn(o, i, generator=g) * 0.01
        sd[name + ".bias"] = torch.zeros(o)

    for idx, c in enumerate((256, 512, 1024, 2048)):
        conv_b(f"backbone.fpn.inner_blocks.{idx}", 256, c, 1)
        conv_b(f"backbone.fpn.layer_blocks.{idx}", 256, 256, 3)
    conv_b("rpn.head.conv", 256, 256, 3)
    conv_b("rpn.head.cls_logits", 3, 256, 1)
    conv_b("rpn.head.bbox_pred", 12, 256, 1)
    dense("roi_heads.box_head.fc6", 1024, 12 * 12 * 256)
    dense("roi_heads.box_head.fc7", 1024, 1024)
    dense("roi_heads.box_predictor.cls_score", num_classes, 1024)
    dense("roi_heads.box_predictor.bbox_pred", num_classes * 4, 1024)
    for i in range(1, 5):
        conv_b(f"roi_heads.mask_head.mask_fcn{i}", 256, 256, 3)
    sd["roi_heads.mask_predictor.conv5_mask.weight"] = torch.randn(256, 256, 2, 2, generator=g) * 0.05
    sd["roi_heads.mask_predictor.conv5_mask.bias"] = torch.zeros(256)
    conv_b("roi_heads.mask_predictor.mask_fcn_logits", num_classes, 256, 1)
    return sd


def test_convert_maskrcnn_into_flax():
    from meshrcnn_tpu.models.pix3d import Pix3DMaskRCNN
    from meshrcnn_tpu.utils.torch_convert import convert_maskrcnn

    sd = build_torch_style_maskrcnn_sd()
    params, stats = convert_maskrcnn(sd, num_classes=10)  # COCO heads dropped
    assert "box_predictor" not in params["roi_heads"]
    assert "mask_fcn_logits" not in params["roi_heads"]["mask_head"]

    model = Pix3DMaskRCNN(num_classes=10, rpn_pre_nms_top_n=64,
                          rpn_post_nms_top_n=32, roi_batch_size=32, mask_rois=8)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    fresh_p = jax.device_get(variables["params"])
    fresh_s = jax.device_get(variables["batch_stats"])

    def check_subset(dst, src, path=""):
        for k, v in src.items():
            assert k in dst, f"missing {path}/{k} in flax params"
            if isinstance(v, dict):
                check_subset(dst[k], v, path + "/" + k)
            else:
                assert np.asarray(dst[k]).shape == np.asarray(v).shape, \
                    f"{path}/{k}: {np.asarray(dst[k]).shape} vs {np.asarray(v).shape}"

    check_subset(fresh_p, params)
    check_subset(fresh_s, stats)


def _torch_bottleneck(sd, pref, x, stride):
    import torch.nn.functional as F

    def bn(name, t):
        return F.batch_norm(t, sd[name + ".running_mean"], sd[name + ".running_var"],
                            sd[name + ".weight"], sd[name + ".bias"],
                            training=False, eps=1e-5)

    y = F.relu(bn(f"{pref}.bn1", F.conv2d(x, sd[f"{pref}.conv1.weight"])))
    y = F.relu(bn(f"{pref}.bn2", F.conv2d(y, sd[f"{pref}.conv2.weight"],
                                          stride=stride, padding=1)))
    y = bn(f"{pref}.bn3", F.conv2d(y, sd[f"{pref}.conv3.weight"]))
    if f"{pref}.downsample.0.weight" in sd:
        r = bn(f"{pref}.downsample.1",
               F.conv2d(x, sd[f"{pref}.downsample.0.weight"], stride=stride))
    else:
        r = x
    return F.relu(y + r)


def _torch_resnet50_forward(sd, x):
    """Hand-rolled torchvision-equivalent ResNet-50 eval forward (NCHW)."""
    import torch.nn.functional as F

    x = F.conv2d(x, sd["conv1.weight"], stride=2, padding=3)
    x = F.batch_norm(x, sd["bn1.running_mean"], sd["bn1.running_var"],
                     sd["bn1.weight"], sd["bn1.bias"], training=False, eps=1e-5)
    x = F.relu(x)
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    fmaps = []
    for i, blocks in enumerate((3, 4, 6, 3), start=1):
        for j in range(blocks):
            x = _torch_bottleneck(sd, f"layer{i}.{j}", x, 2 if (i > 1 and j == 0) else 1)
        fmaps.append(x)
    pooled = x.mean(dim=(2, 3))
    logits = pooled @ sd["fc.weight"].T + sd["fc.bias"]
    return logits, fmaps


def test_resnet50_forward_activation_parity():
    """Numeric parity, not just placement (reference: shapenet_model.py:139-150
    loads real zoo weights): the flax forward on converted weights must match a
    hand-rolled torch forward of the same state dict — logits and every C2..C5
    activation map."""
    sd = build_torch_style_state_dict(num_classes=1000)
    with torch.no_grad():
        x_t = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(1))
        t_logits, t_fmaps = _torch_resnet50_forward(sd, x_t)

    params, stats = convert_resnet50(sd, num_classes=1000)  # fc kept
    model = ResNet50(num_classes=1000)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                merge(dst[k], v)
            else:
                assert np.asarray(dst[k]).shape == np.asarray(v).shape, k
                dst[k] = jnp.asarray(np.asarray(v), dtype=np.asarray(dst[k]).dtype)

    p = jax.device_get(variables["params"]); merge(p, params)
    s = jax.device_get(variables["batch_stats"]); merge(s, stats)

    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    j_logits, j_fmaps = model.apply({"params": p, "batch_stats": s}, x_j, train=False)

    for tf, jf, name in zip(t_fmaps, j_fmaps, ("c2", "c3", "c4", "c5")):
        np.testing.assert_allclose(np.asarray(jf),
                                   tf.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-3, atol=1e-4, err_msg=name)
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_maskrcnn_fpn_and_box_head_forward_parity():
    """FPN pyramid + box TwoMLPHead numeric parity on converted Mask R-CNN
    weights (reference: pix3d_model.py:163-178). Catches layout bugs placement
    checks can't — e.g. fc6 consuming NCHW-flattened features while the flax
    head flattens NHWC."""
    import torch.nn.functional as F

    from meshrcnn_tpu.models.fpn import ResNetFPN
    from meshrcnn_tpu.models.roi_heads import TwoMLPHead
    from meshrcnn_tpu.utils.torch_convert import convert_maskrcnn

    sd = build_torch_style_maskrcnn_sd()
    body = {k[len("backbone.body."):]: v for k, v in sd.items()
            if k.startswith("backbone.body.")}
    body["fc.weight"] = torch.zeros(1000, 2048)
    body["fc.bias"] = torch.zeros(1000)

    with torch.no_grad():
        x_t = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(2))
        _, c = _torch_resnet50_forward(body, x_t)
        inner = [F.conv2d(c[i], sd[f"backbone.fpn.inner_blocks.{i}.weight"],
                          sd[f"backbone.fpn.inner_blocks.{i}.bias"]) for i in range(4)]
        t_p = [None] * 4
        t_p[3] = inner[3]
        for i in (2, 1, 0):
            t_p[i] = inner[i] + F.interpolate(t_p[i + 1], size=inner[i].shape[-2:],
                                              mode="nearest")
        t_p = [F.conv2d(t_p[i], sd[f"backbone.fpn.layer_blocks.{i}.weight"],
                        sd[f"backbone.fpn.layer_blocks.{i}.bias"], padding=1)
               for i in range(4)]
        t_p6 = F.max_pool2d(t_p[3], 1, stride=2)

        pooled = torch.randn(3, 256, 12, 12, generator=torch.Generator().manual_seed(3))
        h = F.relu(pooled.flatten(1) @ sd["roi_heads.box_head.fc6.weight"].T
                   + sd["roi_heads.box_head.fc6.bias"])
        t_box = F.relu(h @ sd["roi_heads.box_head.fc7.weight"].T
                       + sd["roi_heads.box_head.fc7.bias"])

    params, stats = convert_maskrcnn(sd, num_classes=10)

    fpn = ResNetFPN()
    variables = jax.jit(fpn.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                merge(dst[k], v)
            else:
                assert np.asarray(dst[k]).shape == np.asarray(v).shape, k
                dst[k] = jnp.asarray(np.asarray(v), dtype=np.asarray(dst[k]).dtype)

    p = jax.device_get(variables["params"]); merge(p, params["backbone"])
    s = jax.device_get(variables["batch_stats"]); merge(s, stats["backbone"])

    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    j_p = fpn.apply({"params": p, "batch_stats": s}, x_j, train=False)
    for i in range(4):
        np.testing.assert_allclose(np.asarray(j_p[i]),
                                   t_p[i].numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-3, atol=5e-2, err_msg=f"p{i + 2}")
    np.testing.assert_allclose(np.asarray(j_p[4]),
                               t_p6.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=5e-2, err_msg="p6")

    head = TwoMLPHead()
    hv = head.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 12 * 12 * 256)))
    hp = jax.device_get(hv["params"]); merge(hp, params["roi_heads"]["box_head"])
    pooled_nhwc = pooled.numpy().transpose(0, 2, 3, 1).reshape(1, 3, -1)
    j_box = head.apply({"params": hp}, jnp.asarray(pooled_nhwc))
    np.testing.assert_allclose(np.asarray(j_box)[0], t_box.numpy(),
                               rtol=1e-3, atol=1e-4)
