"""Post-training int8 quantization for the non-flagship CT trunks.

Extends ``eval/quant.py`` (the MC3 runner) to the other conv trunks the
factory dispatches — the reference's timed batch-1 metric
(``test_ddp.py:214-234``) exists for every ``model_CT``, and the zoo bench
(BENCH_NOTES r3) measured their serving legs CT-forward bound exactly like
the flagship:

- ``resnet2plus1d_18`` (``model/dim3/resnet2plus1D.py:6-17``): spatial
  (1,3,3) + temporal (3,1,1) factorised convs — both MXU GEMM-shaped once
  depth is folded, both quantized; the 1->3ch stem and the cin=3 R2Plus1d
  spatial stem stay float (low-channel rule), as do the fc0/fc1 head
  Denses (a negligible slice of the FLOPs).
- ``medicalNet`` (``model/dim3/medicalNet.py:5-55``): bottleneck 1x1x1 /
  3x3x3 convs quantized; the cin=1 (7,7,7) stem stays float.

Scheme, scales, and BN folding are identical to ``quant.py`` (per-cout
symmetric int8 weights, calibrated per-tensor activation scales — every
quantized input is post-ReLU so the one-sided [0,127] range applies, and
temporal folds run ON int8 so the fold bytes are halved).  The float path
of each runner (``scales=None``) is the parity anchor against the flax
module's own ``apply`` (tests/test_quant_zoo.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quant import _bn_affine, _conv2d, _fold_kernel, _fold_temporal


def _fold2d(x5):
    """(B, D, H, W, C) -> (B*D, H, W, C) + shape info for unfolding."""
    b, d, h, w, c = x5.shape
    return x5.reshape(b * d, h, w, c), (b, d)


def _site2(x, name, scales, observed, kq_pack, k2d, stride, pad, dtype,
           fold_kd=0, fold_sd=1, fold_pd=0, fold_shape=None):
    """One quantized-conv site (generalised ``quant._site``: temporal folds
    may be strided/padded — MedicalNet's (3,3,3) stride-2 bottleneck convs
    and R(2+1)D's stride-2 temporal convs need (sd, pd) != (1, 1)).

    ``fold_kd``: temporal sites pass the UNFOLDED (B*D, H, W, C) input and
    the depth tap count; quantization happens at the unfolded width and the
    dfold window concat runs on int8 (max|fold(x)| == max|x|, so the
    calibrated scale is identical either way — BENCH_NOTES r3 ruling)."""
    def fold(t):
        if not fold_kd:
            return t
        t5 = t.reshape(*fold_shape, *t.shape[1:])
        t2, _ = _fold_temporal(t5, fold_kd, sd=fold_sd, pd=fold_pd)
        return t2

    if scales is None:
        if observed is not None:
            observed[name] = jnp.max(jnp.abs(x))
        return _conv2d(fold(x.astype(dtype)), k2d.astype(dtype),
                       stride, pad)
    sx = scales[name]
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    kq, sw = kq_pack[name]
    y = _conv2d(fold(xq), kq, stride, pad, pet=jnp.int32)
    return (y.astype(jnp.float32) * (sx * sw)).astype(dtype)


def _dout(d, kd, sd, pd):
    return (d + 2 * pd - kd) // sd + 1


def _k2d(k):
    """Pointwise-in-depth kernels to 2-D HWIO.  ``_ConvBN`` stores a 4-D
    kernel for its depth-independent (1,kH,kW) stride-1 branch but a 5-D
    one when the depth stride forces the generic nn.Conv path
    (models/ct_mc3.py:298-316) — both run here as the same 2-D conv."""
    if k.ndim == 4:
        return k
    assert k.shape[0] == 1, k.shape
    return k[0]


# --------------------------------------------------------------------------
# R(2+1)D-18
# --------------------------------------------------------------------------

_R2P1D_STAGES = ((64, 1), (128, 2), (256, 2), (512, 2))


def run_r2p1d_trunk(cfg, variables, x, *, scales=None, observed=None,
                    kq_pack=None, dtype=jnp.float32):
    """Resnet2plus1D_18 forward (eval BN) over its variable tree; float when
    ``scales`` is None, int8 otherwise.  Returns the (B, 512) head output
    (same contract as ``Resnet2plus1D_18.apply`` — models/ct_r2plus1d.py)."""
    params, stats = variables["params"], variables["batch_stats"]
    dt = dtype
    b = x.shape[0]

    def bnrelu(y, p, s, relu=True):
        sc, bi = _bn_affine(p, s)
        y = y * sc.astype(y.dtype) + bi.astype(y.dtype)
        return jax.nn.relu(y) if relu else y

    # stem: LowChannelConv3D(1->3, (3,2,2), s(1,2,2), p(1,0,0)) — float
    dk = params["downsampling"]["kernel"].astype(dt)        # (3,2,2,1,3)
    y, d = _fold_temporal(x.astype(dt), dk.shape[0], sd=1, pd=1)
    y = _conv2d(y, _fold_kernel(dk), (2, 2), (0, 0))
    y = y + params["downsampling"]["bias"].astype(y.dtype)
    h = w = y.shape[1]

    # R2Plus1dStem: spatial (1,7,7) cin=3 (float, low-channel) ...
    sk = params["stem_s"]["conv"]["kernel"].astype(dt)      # (7,7,3,45)
    y = _conv2d(y, sk, (2, 2), (3, 3))
    y = bnrelu(y, params["stem_s"]["bn"], stats["stem_s"]["bn"])
    # ... then temporal (3,1,1) cin=45 — quantized
    tk = params["stem_t"]["conv"]["kernel"]                  # (3,1,1,45,64)
    y = _site2(y, "stem_t", scales, observed, kq_pack, _fold_kernel(tk),
               (1, 1), (0, 0), dt, fold_kd=3, fold_sd=1, fold_pd=1,
               fold_shape=(b, d))
    y = bnrelu(y, params["stem_t"]["bn"], stats["stem_t"]["bn"])

    def conv2plus1d(y, d, nm, which, stride):
        """_Conv2Plus1D: spatial (1,3,3) conv+BN+relu, temporal (3,1,1)."""
        p, s = params[nm][which], stats[nm][which]
        ks = p["spatial"]["conv"]["kernel"]                  # (3,3,cin,mid)
        y = _site2(y, f"{nm}/{which}/spatial", scales, observed, kq_pack,
                   ks, (stride, stride), (1, 1), dt)
        y = bnrelu(y, p["spatial"]["bn"], s["spatial"]["bn"])
        kt = p["temporal"]["kernel"]                         # (3,1,1,mid,F)
        dn = _dout(d, 3, stride, 1)
        y = _site2(y, f"{nm}/{which}/temporal", scales, observed, kq_pack,
                   _fold_kernel(kt), (1, 1), (0, 0), dt, fold_kd=3,
                   fold_sd=stride, fold_pd=1, fold_shape=(b, d))
        return y, dn

    for i, (feats, first_stride) in enumerate(_R2P1D_STAGES):
        for blk in range(2):
            nm = f"layer{i + 1}_{blk}"
            stride = first_stride if blk == 0 else 1
            p, s = params[nm], stats[nm]
            rin, din = y, d
            y, d = conv2plus1d(y, d, nm, "conv1", stride)
            y = bnrelu(y, p["bn1"], s["bn1"])
            y, d = conv2plus1d(y, d, nm, "conv2", 1)
            y = bnrelu(y, p["bn2"], s["bn2"], relu=False)
            if "downsample" in p:
                # (1,1,1) stride-s conv = depth/space subsample + 1x1 GEMM
                r5 = rin.reshape(b, din, *rin.shape[1:])[:, ::stride]
                r, _ = _fold2d(r5)
                kd_ = p["downsample"]["conv"]["kernel"]
                r = _site2(r, f"{nm}/downsample", scales, observed, kq_pack,
                           _k2d(kd_), (stride, stride), (0, 0), dt)
                r = bnrelu(r, p["downsample"]["bn"], s["downsample"]["bn"],
                           relu=False)
            else:
                r = rin
            y = jax.nn.relu(r.astype(y.dtype) + y)

    y = y.reshape(b, d, *y.shape[1:]).mean(axis=(1, 2, 3))   # global pool
    for fc in ("fc0", "fc1"):
        y = jax.nn.relu(y @ params[fc]["kernel"].astype(y.dtype)
                        + params[fc]["bias"].astype(y.dtype))
    return y


def _sites_r2p1d(params):
    tk = params["stem_t"]["conv"]["kernel"]
    yield "stem_t", _fold_kernel(tk)
    for i, _ in enumerate(_R2P1D_STAGES):
        for blk in range(2):
            nm = f"layer{i + 1}_{blk}"
            p = params[nm]
            for which in ("conv1", "conv2"):
                yield (f"{nm}/{which}/spatial",
                       p[which]["spatial"]["conv"]["kernel"])
                yield (f"{nm}/{which}/temporal",
                       _fold_kernel(p[which]["temporal"]["kernel"]))
            if "downsample" in p:
                yield (f"{nm}/downsample",
                       _k2d(p["downsample"]["conv"]["kernel"]))


# --------------------------------------------------------------------------
# MedicalNet (ResNet-101 bottleneck stages 1-2)
# --------------------------------------------------------------------------

_MEDNET_LAYERS = ((3, 64), (4, 128))


def run_mednet_trunk(cfg, variables, x, *, scales=None, observed=None,
                     kq_pack=None, dtype=jnp.float32):
    """MedicalNetFeatures forward (eval BN): returns the layer2
    (B, D', H', W', 512) map (same contract as ``MedicalNetFeatures.apply``
    — models/ct_mc3.py:456-489)."""
    import flax.linen as nn

    params, stats = variables["params"], variables["batch_stats"]
    dt = dtype
    b = x.shape[0]

    def bnrelu(y, p, s, relu=True):
        sc, bi = _bn_affine(p, s)
        y = y * sc.astype(y.dtype) + bi.astype(y.dtype)
        return jax.nn.relu(y) if relu else y

    # stem (7,7,7) s2 p3, cin=1 — float (low-channel)
    sk = params["stem"]["conv"]["kernel"].astype(dt)        # (7,7,7,1,64)
    y, d = _fold_temporal(x.astype(dt), 7, sd=2, pd=3)
    y = _conv2d(y, _fold_kernel(sk), (2, 2), (3, 3))
    y = bnrelu(y, params["stem"]["bn"], stats["stem"]["bn"])
    # MaxPool3d(3, 2, padding=1), torch window alignment
    y5 = y.reshape(b, d, *y.shape[1:])
    y5 = nn.max_pool(y5, (3, 3, 3), strides=(2, 2, 2),
                     padding=((1, 1), (1, 1), (1, 1)))
    d = y5.shape[1]
    y, _ = _fold2d(y5)

    for i, (n_blocks, feats) in enumerate(_MEDNET_LAYERS):
        for blk in range(n_blocks):
            nm = f"layer{i + 1}_{blk}"
            stride = 2 if (i > 0 and blk == 0) else 1
            p, s = params[nm], stats[nm]
            rin, din = y, d
            k1 = p["conv1"]["conv"]["kernel"]               # 4-D or 5-D
            y = _site2(y, f"{nm}/conv1", scales, observed, kq_pack,
                       _k2d(k1), (1, 1), (0, 0), dt)
            y = bnrelu(y, p["conv1"]["bn"], s["conv1"]["bn"])
            k2 = p["conv2"]["conv"]["kernel"]               # (3,3,3,f,f)
            dn = _dout(d, 3, stride, 1)
            y = _site2(y, f"{nm}/conv2", scales, observed, kq_pack,
                       _fold_kernel(k2), (stride, stride), (1, 1), dt,
                       fold_kd=3, fold_sd=stride, fold_pd=1,
                       fold_shape=(b, d))
            d = dn
            y = bnrelu(y, p["conv2"]["bn"], s["conv2"]["bn"])
            k3 = p["conv3"]["conv"]["kernel"]
            y = _site2(y, f"{nm}/conv3", scales, observed, kq_pack,
                       _k2d(k3), (1, 1), (0, 0), dt)
            y = bnrelu(y, p["conv3"]["bn"], s["conv3"]["bn"], relu=False)
            if "downsample" in p:
                r5 = rin.reshape(b, din, *rin.shape[1:])[:, ::stride]
                r, _ = _fold2d(r5)
                kd_ = p["downsample"]["conv"]["kernel"]
                r = _site2(r, f"{nm}/downsample", scales, observed, kq_pack,
                           _k2d(kd_), (stride, stride), (0, 0), dt)
                r = bnrelu(r, p["downsample"]["bn"], s["downsample"]["bn"],
                           relu=False)
            else:
                r = rin
            y = jax.nn.relu(r.astype(y.dtype) + y)
    return y.reshape(b, d, *y.shape[1:])


def _sites_mednet(params):
    for i, (n_blocks, _) in enumerate(_MEDNET_LAYERS):
        for blk in range(n_blocks):
            nm = f"layer{i + 1}_{blk}"
            p = params[nm]
            for which in ("conv1", "conv2", "conv3", "downsample"):
                if which not in p:
                    continue
                k = p[which]["conv"]["kernel"]
                k2 = (_fold_kernel(k) if k.shape[:3] == (3, 3, 3)
                      else _k2d(k))
                yield f"{nm}/{which}", k2
