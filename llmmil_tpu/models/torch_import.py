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
