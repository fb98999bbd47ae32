"""Weight importers: torch checkpoints → flax param/batch-stats trees.

Parity target: the reference loads torchvision ``mc3_18(weights='DEFAULT')``
(``model/dim3/resnetMC3.py:15``) and OpenAI CLIP checkpoints
(``clip/clip.py:29-182``).  These converters map a torch ``state_dict`` onto
this framework's modules so "bitwise-comparable logits on fixed seeds"
(BASELINE north star) is achievable when the external weights are provided.

Layout rules:
- Conv3d (out, in, kD, kH, kW) → NDHWC kernel (kD, kH, kW, in, out)
- Conv2d (out, in, kH, kW)     → (kH, kW, in, out)
- Linear (out, in)             → (in, out)
- BatchNorm weight/bias → scale/bias; running stats → batch_stats.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().float().numpy()
    return np.asarray(v, dtype=np.float32)


def _conv3d(w):
    k = np.transpose(_np(w), (2, 3, 4, 1, 0))
    if k.shape[0] == 1:
        # depth-independent (1,kH,kW) convs run as folded 2-D convs in this
        # framework (ct_mc3._ConvBN) → 4-D kernels
        return k[0]
    return k


def _bn(sd, pre):
    params = {"scale": _np(sd[pre + "weight"]),
              "bias": _np(sd[pre + "bias"])}
    stats = {"mean": _np(sd[pre + "running_mean"]),
             "var": _np(sd[pre + "running_var"])}
    return params, stats


def convert_mc3_state_dict(sd: Dict, layers=(2, 2, 2, 2)
                           ) -> Tuple[Dict, Dict]:
    """torchvision VideoResNet (mc3_18) state_dict →
    (params, batch_stats) for :class:`VideoResNetFeatures`.

    torchvision naming: ``stem.0`` conv / ``stem.1`` BN;
    ``layer{i}.{b}.conv1.0`` conv / ``.conv1.1`` BN; ``conv2`` likewise;
    ``downsample.0`` conv / ``.1`` BN.
    """
    params: Dict = {}
    stats: Dict = {}

    bn_p, bn_s = _bn(sd, "stem.1.")
    params["stem"] = {"conv": {"kernel": _conv3d(sd["stem.0.weight"])},
                      "bn": bn_p}
    stats["stem"] = {"bn": bn_s}

    for i, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            pre = f"layer{i + 1}.{b}."
            name = f"layer{i + 1}_{b}"
            blk_p: Dict = {}
            blk_s: Dict = {}
            for conv in ("conv1", "conv2"):
                bn_p, bn_s = _bn(sd, pre + conv + ".1.")
                blk_p[conv] = {
                    "conv": {"kernel": _conv3d(sd[pre + conv + ".0.weight"])},
                    "bn": bn_p}
                blk_s[conv] = {"bn": bn_s}
            if pre + "downsample.0.weight" in sd:
                bn_p, bn_s = _bn(sd, pre + "downsample.1.")
                blk_p["downsample"] = {
                    "conv": {"kernel": _conv3d(
                        sd[pre + "downsample.0.weight"])},
                    "bn": bn_p}
                blk_s["downsample"] = {"bn": bn_s}
            params[name] = blk_p
            stats[name] = blk_s
    return params, stats


def convert_resnet_mc3_18(sd_model: Dict, sd_downsampling: Dict | None = None
                          ) -> Tuple[Dict, Dict]:
    """Full reference ``ResnetMC3_18`` → :class:`ResnetMC3_18` params.

    ``sd_model``: torchvision trunk state_dict (keys ``stem.*``/``layer*``).
    ``sd_downsampling``: optional {'weight','bias'} of the reference's 1→3ch
    Conv3d stem (``resnetMC3.py:10-14``).
    """
    trunk_p, trunk_s = convert_mc3_state_dict(sd_model)
    params = {"trunk": trunk_p}
    stats = {"trunk": trunk_s}
    if sd_downsampling is not None:
        params["downsampling"] = {
            "kernel": _conv3d(sd_downsampling["weight"]),
            "bias": _np(sd_downsampling["bias"])}
    return params, stats


def convert_r2plus1d_18(sd_model: Dict,
                        sd_downsampling: Dict | None = None,
                        layers=(2, 2, 2, 2)) -> Tuple[Dict, Dict]:
    """torchvision ``r2plus1d_18`` state_dict (+ the reference's 1→3ch
    stem, ``model/dim3/resnet2plus1D.py:11``) → (params, batch_stats) for
    :class:`~llmmil_tpu.models.ct_r2plus1d.Resnet2plus1D_18`.

    torchvision naming (video/resnet.py, Conv2Plus1D = Sequential[spatial
    conv, BN(mid), ReLU, temporal conv]):

    - ``stem.0``/``stem.1``  (1,7,7) conv + BN(45)   → ``stem_s``
    - ``stem.3``/``stem.4``  (3,1,1) conv + BN(64)   → ``stem_t``
    - ``layer{i}.{b}.conv1.0.0`` spatial conv        → ``conv1/spatial/conv``
    - ``layer{i}.{b}.conv1.0.1`` mid BN              → ``conv1/spatial/bn``
    - ``layer{i}.{b}.conv1.0.3`` temporal conv       → ``conv1/temporal``
    - ``layer{i}.{b}.conv1.1``   out BN              → ``bn1``  (conv2 → bn2)
    - ``layer{i}.{b}.downsample.0/1`` (1,1,1)/s2 conv + BN → ``downsample``
    - ``fc.0`` / ``fc.2``  the reference's replaced head (Linear→ReLU→
      Linear→ReLU, resnet2plus1D.py:14-15)          → ``fc0`` / ``fc1``

    The (1,kH,kW) spatial convs fold to 4-D kernels (``_ConvBN``'s 2-D
    path); the strided (1,1,1) downsample keeps its kD axis (a true 3-D
    conv, like medicalNet's); temporal (3,1,1) kernels stay 5-D
    (``DepthFoldedConv`` shares ``nn.Conv``'s param shape).
    """
    params: Dict = {}
    stats: Dict = {}

    bn_p, bn_s = _bn(sd_model, "stem.1.")
    params["stem_s"] = {"conv": {"kernel": _conv3d(sd_model["stem.0.weight"])},
                        "bn": bn_p}
    stats["stem_s"] = {"bn": bn_s}
    bn_p, bn_s = _bn(sd_model, "stem.4.")
    params["stem_t"] = {"conv": {"kernel": _conv3d(sd_model["stem.3.weight"])},
                        "bn": bn_p}
    stats["stem_t"] = {"bn": bn_s}

    for i, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            pre = f"layer{i + 1}.{b}."
            name = f"layer{i + 1}_{b}"
            blk_p: Dict = {}
            blk_s: Dict = {}
            for conv, bn_out in (("conv1", "bn1"), ("conv2", "bn2")):
                cpre = pre + conv + "."
                mid_p, mid_s = _bn(sd_model, cpre + "0.1.")
                blk_p[conv] = {
                    "spatial": {"conv": {"kernel": _conv3d(
                        sd_model[cpre + "0.0.weight"])}, "bn": mid_p},
                    "temporal": {"kernel": _conv3d(
                        sd_model[cpre + "0.3.weight"])},
                }
                blk_s[conv] = {"spatial": {"bn": mid_s}}
                out_p, out_s = _bn(sd_model, cpre + "1.")
                blk_p[bn_out] = out_p
                blk_s[bn_out] = out_s
            if pre + "downsample.0.weight" in sd_model:
                bn_p, bn_s = _bn(sd_model, pre + "downsample.1.")
                # strided (2,2,2) 1³ conv → true 3-D conv: keep kD axis
                w = np.transpose(_np(sd_model[pre + "downsample.0.weight"]),
                                 (2, 3, 4, 1, 0))
                blk_p["downsample"] = {"conv": {"kernel": w}, "bn": bn_p}
                blk_s["downsample"] = {"bn": bn_s}
            params[name] = blk_p
            stats[name] = blk_s

    params["fc0"] = {"kernel": _np(sd_model["fc.0.weight"]).T,
                     "bias": _np(sd_model["fc.0.bias"])}
    params["fc1"] = {"kernel": _np(sd_model["fc.2.weight"]).T,
                     "bias": _np(sd_model["fc.2.bias"])}
    if sd_downsampling is not None:
        params["downsampling"] = {
            "kernel": _conv3d(sd_downsampling["weight"]),
            "bias": _np(sd_downsampling["bias"])}
    return params, stats


def _pooled_size(n: int, stride: int, kernel: int = 3) -> int:
    """Conv/pool output length at padding k//2 (torch formula)."""
    if stride <= 1:
        return n
    return (n + 2 * (kernel // 2) - kernel) // stride + 1


def convert_mvit_v2_state_dict(sd: Dict, blocks=None,
                               target_grid: "Tuple[int, int] | None" = None
                               ) -> Tuple[Dict, list]:
    """torchvision ``mvit_v2_s`` state dict (T=1 reading) →
    (params, dropped_keys) for :class:`~llmmil_tpu.models.ct_mvit.MViTv2Encoder`.

    The reference wraps ``models.video.mvit_v2_s`` with its classifier
    head replaced by Linear(768, 512) (``model/dim3/mvit_v2.py:15-17``)
    and feeds T=1 clips, so:

    - every (3,·,·) temporal kernel keeps only its CENTRE tap (the other
      two see the (1,3,3)-padding zeros): ``conv_proj`` and the
      ``pool_{q,k,v}`` depthwise convs squeeze to 2-D;
    - ``rel_pos_t`` interpolates down to its single T=1 row (constant
      across grid keys but NOT the class column, so it must be kept);
    - spatial ``rel_pos_h/w`` tables are linearly resized to
      ``target_grid`` (patch grid = input//4) when it differs from the
      checkpoint's 224²→56² — torchvision does the same interpolation at
      runtime (video/mvit.py ``_interpolate``), here it happens once at
      conversion because flax shapes are static.
    """
    from .ct_mvit import _interp_rel_table, mvit_v2_s_blocks
    blocks = tuple(blocks) if blocks is not None else mvit_v2_s_blocks()

    params: Dict = {
        "conv_proj": {
            "kernel": np.transpose(_np(sd["conv_proj.weight"])[:, :, 1],
                                   (2, 3, 1, 0)),
            "bias": _np(sd["conv_proj.bias"])},
        "cls_token": _np(sd["pos_encoding.class_token"]),
        "norm": {"scale": _np(sd["norm.weight"]),
                 "bias": _np(sd["norm.bias"])},
        "head": {"kernel": _np(sd["head.1.weight"]).T,
                 "bias": _np(sd["head.1.bias"])},
    }
    dropped = []
    h = w = None
    if target_grid is not None:
        h, w = target_grid
    for i, bc in enumerate(blocks):
        pre = f"blocks.{i}."
        blk: Dict = {
            "norm1": {"scale": _np(sd[pre + "norm1.weight"]),
                      "bias": _np(sd[pre + "norm1.bias"])},
            "norm2": {"scale": _np(sd[pre + "norm2.weight"]),
                      "bias": _np(sd[pre + "norm2.bias"])},
            "mlp1": {"kernel": _np(sd[pre + "mlp.0.weight"]).T,
                     "bias": _np(sd[pre + "mlp.0.bias"])},
            "mlp2": {"kernel": _np(sd[pre + "mlp.3.weight"]).T,
                     "bias": _np(sd[pre + "mlp.3.bias"])},
        }
        if pre + "project.weight" in sd:        # stage-transition blocks
            blk["project"] = {
                "kernel": _np(sd[pre + "project.weight"]).T,
                "bias": _np(sd[pre + "project.bias"])}
        attn: Dict = {
            "qkv": {"kernel": _np(sd[pre + "attn.qkv.weight"]).T,
                    "bias": _np(sd[pre + "attn.qkv.bias"])},
            "project": {
                "kernel": _np(sd[pre + "attn.project.0.weight"]).T,
                "bias": _np(sd[pre + "attn.project.0.bias"])},
        }
        for which in ("q", "k", "v"):
            pk = pre + f"attn.pool_{which}."
            attn[f"pool_{which}"] = {"kernel": np.transpose(
                _np(sd[pk + "pool.weight"])[:, :, 1], (2, 3, 1, 0))}
            attn[f"pool_{which}_norm"] = {
                "scale": _np(sd[pk + "norm_act.0.weight"]),
                "bias": _np(sd[pk + "norm_act.0.bias"])}
        rel_h = _np(sd[pre + "attn.rel_pos_h"])
        rel_w = _np(sd[pre + "attn.rel_pos_w"])
        if h is not None:
            qh = _pooled_size(h, bc.q_stride, bc.pool_kernel)
            qw = _pooled_size(w, bc.q_stride, bc.pool_kernel)
            kh = _pooled_size(h, bc.kv_stride, bc.pool_kernel)
            kw = _pooled_size(w, bc.kv_stride, bc.pool_kernel)
            rel_h = _interp_rel_table(rel_h, 2 * max(qh, kh) - 1)
            rel_w = _interp_rel_table(rel_w, 2 * max(qw, kw) - 1)
            h, w = qh, qw
        attn["rel_pos_h"] = rel_h
        attn["rel_pos_w"] = rel_w
        # T=1: interpolate the (2T−1, dh) temporal table to its single
        # runtime row (torchvision resizes at runtime the same way); the
        # bias does NOT cancel in softmax — torch adds it to the grid
        # block only, so the class column's relative weight depends on it
        attn["rel_pos_t"] = _interp_rel_table(
            _np(sd[pre + "attn.rel_pos_t"]), 1)
        blk["attn"] = attn
        params[f"block{i}"] = blk
    return params, dropped


def convert_medicalnet_state_dict(sd: Dict, layers=(3, 4)
                                  ) -> Tuple[Dict, Dict]:
    """MedicalNet 3-D ResNet-101 state_dict (Tencent MedicalNet
    ``models/resnet.py`` naming; the reference loads
    ``model/dim3/MedicalNet/pretrain/resnet_101.pth``, medicalNet.py:31) →
    (params, batch_stats) for :class:`MedicalNetFeatures`.

    Only the stages the reference consumes are mapped (stem + layer1/2 —
    it returns the layer2 map, medicalNet.py:44-55).  Checkpoints saved via
    DataParallel carry a ``module.`` prefix — stripped here.
    """
    sd = { (k[7:] if k.startswith("module.") else k): v
           for k, v in sd.items() }
    params: Dict = {}
    stats: Dict = {}

    bn_p, bn_s = _bn(sd, "bn1.")
    params["stem"] = {"conv": {"kernel": _conv3d(sd["conv1.weight"])},
                      "bn": bn_p}
    stats["stem"] = {"bn": bn_s}

    for i, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            pre = f"layer{i + 1}.{b}."
            name = f"layer{i + 1}_{b}"
            blk_p: Dict = {}
            blk_s: Dict = {}
            for conv in ("conv1", "conv2", "conv3"):
                bn_p, bn_s = _bn(sd, pre + conv.replace("conv", "bn") + ".")
                blk_p[conv] = {
                    "conv": {"kernel": _conv3d(sd[pre + conv + ".weight"])},
                    "bn": bn_p}
                blk_s[conv] = {"bn": bn_s}
            if pre + "downsample.0.weight" in sd:
                bn_p, bn_s = _bn(sd, pre + "downsample.1.")
                w = np.transpose(
                    _np(sd[pre + "downsample.0.weight"]), (2, 3, 4, 1, 0))
                if not (i > 0 and b == 0):
                    # stride-1 1³ downsamples fold to 2-D convs → 4-D kernel;
                    # the strided (2,2,2) one (first block of layer2+) stays
                    # a true 3-D conv in _ConvBN → keep the kD=1 axis
                    w = w[0]
                blk_p["downsample"] = {"conv": {"kernel": w}, "bn": bn_p}
                blk_s["downsample"] = {"bn": bn_s}
            params[name] = blk_p
            stats[name] = blk_s
    return params, stats
