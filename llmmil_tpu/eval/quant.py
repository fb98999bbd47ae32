"""Post-training int8 quantization of the CT trunk for batch-1 serving.

Beyond-reference serving feature.  The reference's timed eval metric is
per-patient batch-1 inference (``test_ddp.py:214-234``); on TPU that is
CT-trunk-forward bound (BENCH_NOTES: 61.5 of the 72 ms step).  The v5e
MXU runs s8xs8->s32 convolutions at ~2x the bf16 rate, and the layer1
hot conv measures 5.40 vs 11.01 ms (scripts/probe_int8_conv.py) — so an
int8 trunk roughly halves the serving bound.

Scheme (standard symmetric PTQ, TPU-shaped):

- **weights**: per-output-channel symmetric int8 (scale = max|w|/127 over
  the (kh, kw, cin) fan-in), quantized ONCE at prepare time;
- **activations**: per-tensor static scales calibrated by running the
  float trunk over calibration volumes and recording max|x| at every
  quantized conv input.  All quantized conv inputs are post-ReLU
  (non-negative), so the int8 range [0, 127] is used one-sidedly —
  identical precision to symmetric on one-sided data;
- **BN folding**: inference BatchNorm is the affine y*g/sqrt(v+eps) +
  (b - m*g/sqrt(v+eps)); it is applied to the dequantized int32 conv
  output, so the whole conv+BN is int8-conv -> int32 -> fused
  scale-and-shift (XLA fuses the epilogue);
- **layout**: temporal (kD,kH,kW) convs run depth-folded exactly like
  the float trunk (``models/ct_mc3.py::DepthFoldedConv`` dfold mode);
  spatial (kH,kW) convs fold depth into batch.  The two low-channel
  stems (cin=1/3 — XLA's pathological 3-D relayout case, and ~4% of the
  forward) stay in the float dtype;
- **residuals / ReLU**: float, between quantized convs.

The float path of :func:`run_trunk` (scales=None) is the parity anchor:
it must match ``ResnetMC3_18.apply`` to conv-reassociation tolerance
(tests/test_quant.py), so the int8 path differs from the model only by
the quantization itself.

Usage::

    scales = calibrate_ct_trunk(cfg, variables, calib_volumes)
    qpack  = quantize_ct_trunk(cfg, variables, scales)
    feats  = jax.jit(lambda q, x: run_trunk_int8(cfg, q, x))(qpack, vol)
    # feed feats to the flagship via batch["ct_features"]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_EPS = 1e-5
_BLOCKS = {  # stage -> (n_blocks, temporal); MC3-18 layout
    "layer1": (2, True), "layer2": (2, False),
    "layer3": (2, False), "layer4": (2, False),
}


def _bn_affine(p, s):
    sc = p["scale"] / jnp.sqrt(s["var"] + _EPS)
    return sc, p["bias"] - s["mean"] * sc


def _fold_temporal(x, kd, sd=1, pd=1):
    """(B,D,H,W,C) -> (B*Dout,H,W,kd*C) dfold windows (stride sd, pad pd)."""
    b, d, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pd, pd), (0, 0), (0, 0), (0, 0))) if pd else x
    dout = (d + 2 * pd - kd) // sd + 1
    span = sd * (dout - 1) + 1
    parts = [xp[:, i:i + span:sd] for i in range(kd)]
    y = jnp.concatenate(parts, axis=-1)
    return y.reshape(b * dout, h, w, kd * c), dout


def _fold_kernel(k):
    """(kD,kH,kW,C,F) -> (kH,kW,kD*C,F) matching :func:`_fold_temporal`."""
    kd, kh, kw, c, f = k.shape
    return jnp.transpose(k, (1, 2, 0, 3, 4)).reshape(kh, kw, kd * c, f)


def _conv2d(x, k, stride=(1, 1), pad=(1, 1), pet=None):
    return lax.conv_general_dilated(
        x, k, stride, ((pad[0], pad[0]), (pad[1], pad[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet)


def _quant_w(k2d):
    """Per-cout symmetric int8 weights for a (kh,kw,cin,f) kernel."""
    sw = jnp.max(jnp.abs(k2d), axis=(0, 1, 2)) / 127.0
    sw = jnp.maximum(sw, 1e-12)
    kq = jnp.clip(jnp.round(k2d / sw), -127, 127).astype(jnp.int8)
    return kq, sw


def _site(x, name, scales, observed, kq_pack, k2d, stride, pad, dtype,
          fold_kd=0, fold_shape=None):
    """One quantized-conv site: float conv when scales is None (observe
    records max|x|), int8 conv otherwise.

    ``fold_kd``: temporal sites pass the UNFOLDED (B*D, H, W, C) input
    plus the depth tap count; quantization happens at the unfolded width
    and the dfold window concat runs on int8 — half the HBM bytes of a
    float fold, and max|fold(x)| == max|x| so the calibrated scale is
    identical either way.  (The first int8 cut folded in bf16 and then
    quantized; the fold materialization ate 19 of the expected 25 ms —
    BENCH_NOTES r3.)"""
    def fold(t):
        if not fold_kd:
            return t
        t5 = t.reshape(*fold_shape, *t.shape[1:])
        t2, _ = _fold_temporal(t5, fold_kd)
        return t2

    if scales is None:
        if observed is not None:
            # fold only duplicates values: max over the unfolded input
            # equals max over the folded windows
            observed[name] = jnp.max(jnp.abs(x))
        return _conv2d(fold(x.astype(dtype)), k2d.astype(dtype),
                       stride, pad)
    sx = scales[name]
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    kq, sw = kq_pack[name]
    y = _conv2d(fold(xq), kq, stride, pad, pet=jnp.int32)
    # dequant straight to the compute dtype: the f32 scale multiply fuses
    # into the conv epilogue and the bf16 store halves the HBM traffic
    return (y.astype(jnp.float32) * (sx * sw)).astype(dtype)


def run_trunk(cfg, variables, x, *, scales=None, observed=None,
              kq_pack=None, dtype=jnp.float32):
    """MC3-18 trunk forward (eval BN) over the flagship's ``extractor_CT``
    variable subtree.  Float when ``scales`` is None; int8 otherwise.

    Returns the layer4 (B, D, H', W', 512) feature map (same contract as
    ``ResnetMC3_18.apply``); in observe mode also fills ``observed`` with
    per-site max|input|.
    """
    params, stats = variables["params"], variables["batch_stats"]
    dt = dtype

    # --- low-channel stems: float always --------------------------------
    b = x.shape[0]
    ss = (1, 1) if cfg.spacing[0] == 2.0 else (2, 2)
    ps = (1, 1)
    dk = params["downsampling"]["kernel"].astype(dt)     # (3,kh,kw,1,3)
    y, d = _fold_temporal(x.astype(dt), dk.shape[0])
    y = _conv2d(y, _fold_kernel(dk), ss, ps)
    y = y + params["downsampling"]["bias"].astype(y.dtype)

    sk = params["trunk"]["stem"]["conv"]["kernel"].astype(dt)  # (3,7,7,3,64)
    y = y.reshape(b, d, *y.shape[1:])
    y, d = _fold_temporal(y, sk.shape[0])
    y = _conv2d(y, _fold_kernel(sk), (2, 2), (3, 3))
    sc, bi = _bn_affine(params["trunk"]["stem"]["bn"],
                        stats["trunk"]["stem"]["bn"])
    y = jax.nn.relu(y * sc.astype(y.dtype) + bi.astype(y.dtype))

    # --- stages ---------------------------------------------------------
    for stage, (n_blocks, temporal) in _BLOCKS.items():
        for bi_ in range(n_blocks):
            nm = f"{stage}_{bi_}"
            p, st = params["trunk"][nm], stats["trunk"][nm]
            stride = 2 if (stage != "layer1" and bi_ == 0) else 1

            def site(inp, which, k5_or_4, s=(1, 1), pad=(1, 1)):
                if k5_or_4.ndim == 5:
                    return _site(inp, f"{nm}/{which}", scales, observed,
                                 kq_pack, _fold_kernel(k5_or_4), s, pad,
                                 dt, fold_kd=k5_or_4.shape[0],
                                 fold_shape=(b, d))
                return _site(inp, f"{nm}/{which}", scales, observed,
                             kq_pack, k5_or_4, s, pad, dt)

            k1 = p["conv1"]["conv"]["kernel"]
            z = site(y, "conv1", k1, (stride, stride), (1, 1))
            sc, bi2 = _bn_affine(p["conv1"]["bn"], st["conv1"]["bn"])
            z = jax.nn.relu(z * sc.astype(z.dtype) + bi2.astype(z.dtype))
            k2_ = p["conv2"]["conv"]["kernel"]
            z = site(z, "conv2", k2_, (1, 1), (1, 1))
            sc, bi2 = _bn_affine(p["conv2"]["bn"], st["conv2"]["bn"])
            z = z * sc.astype(z.dtype) + bi2.astype(z.dtype)

            if "downsample" in p:
                r = site(y, "downsample", p["downsample"]["conv"]["kernel"],
                         (stride, stride), (0, 0))
                sc, bi2 = _bn_affine(p["downsample"]["bn"],
                                     st["downsample"]["bn"])
                r = r * sc.astype(r.dtype) + bi2.astype(r.dtype)
            else:
                r = y
            y = jax.nn.relu(r.astype(z.dtype) + z)
    return y.reshape(b, d, *y.shape[1:])


def _extractor_vars(variables):
    """The ``extractor_CT`` subtree if present (flagship variables),
    else the variables as-is (a bare ResnetMC3_18 tree)."""
    if "extractor_CT" in variables.get("params", {}):
        return {c: t["extractor_CT"] for c, t in variables.items()
                if "extractor_CT" in t}
    return variables


def _impl_for(cfg):
    """(runner, sites_fn) for ``cfg.model_CT`` — the MC3 runner in this
    module, or the zoo runners (``eval/quant_zoo.py``).  ``sites_fn`` is
    None for MC3 (its site walk lives in :func:`quantize_ct_trunk`)."""
    m = cfg.model_CT
    if m in ("resnetMC3_18", "resnetMC3_18_wMask"):
        return run_trunk, None
    if m == "resnet2plus1d_18":
        from .quant_zoo import _sites_r2p1d, run_r2p1d_trunk
        return run_r2p1d_trunk, _sites_r2p1d
    if m == "medicalNet":
        from .quant_zoo import _sites_mednet, run_mednet_trunk
        return run_mednet_trunk, _sites_mednet
    raise ValueError(
        f"ct_int8 is unsupported for model_CT={m!r}: only the conv trunks "
        "(resnetMC3_18[_wMask], resnet2plus1d_18, medicalNet) have int8 "
        "runners; the attention trunks (SwinUNETR*, MViT) are matmul-"
        "dominated and need weight+activation GEMM quantization instead")


def calibrate_ct_trunk(cfg, variables, volumes, dtype=jnp.float32):
    """Run the float trunk over ``volumes`` (iterable of (B,D,H,W,1))
    and return per-site activation scales {site: max|x|/127}."""
    runner, _ = _impl_for(cfg)
    sub = _extractor_vars(variables)
    agg = {}

    @jax.jit
    def one(x):
        obs = {}
        runner(cfg, sub, x, observed=obs, dtype=dtype)
        return obs

    for v in volumes:
        obs = one(jnp.asarray(v))
        for k, m in obs.items():
            m = float(m)
            agg[k] = max(agg.get(k, 0.0), m)
    if not agg:
        raise ValueError("calibration saw no volumes")
    return {k: jnp.float32(max(m, 1e-12) / 127.0) for k, m in agg.items()}


def quantize_ct_trunk(cfg, variables, scales, dtype=jnp.float32):
    """Prepare the serving pack: int8 per-cout weights for every quantized
    site + the float variables (stems/BN) + activation scales."""
    sub = _extractor_vars(variables)
    params = sub["params"]
    _, sites_fn = _impl_for(cfg)
    if sites_fn is not None:                       # zoo trunk
        kq_pack = {name: _quant_w(k2) for name, k2 in sites_fn(params)}
        missing = set(kq_pack) - set(scales)
        if missing:
            raise ValueError(f"calibration missed sites: {sorted(missing)}")
        return {"variables": sub, "scales": dict(scales), "kq": kq_pack}
    kq_pack = {}
    for stage, (n_blocks, _) in _BLOCKS.items():
        for b_ in range(n_blocks):
            nm = f"{stage}_{b_}"
            p = params["trunk"][nm]
            for which in ("conv1", "conv2", "downsample"):
                if which not in p:
                    continue
                k = p[which]["conv"]["kernel"]
                k2 = _fold_kernel(k) if k.ndim == 5 else k
                kq_pack[f"{nm}/{which}"] = _quant_w(k2)
    return {"variables": sub, "scales": dict(scales), "kq": kq_pack}


def run_trunk_int8(cfg, qpack, x, dtype=jnp.float32):
    """Jittable int8 trunk forward over a prepared ``qpack``."""
    runner, _ = _impl_for(cfg)
    return runner(cfg, qpack["variables"], x, scales=qpack["scales"],
                  kq_pack=qpack["kq"], dtype=dtype)


def int8_ct_features(cfg, variables, calib_volumes, dtype=jnp.bfloat16):
    """Calibrate + quantize + return a jitted feature fn for serving.

    The returned ``fn(volume) -> layer4 features`` result feeds the
    flagship through ``batch['ct_features']`` (models/aggregator.py), the
    same injection path the depth-sharded serving mode uses.
    """
    scales = calibrate_ct_trunk(cfg, variables, calib_volumes, dtype=dtype)
    qpack = quantize_ct_trunk(cfg, variables, scales, dtype=dtype)
    fn = jax.jit(lambda q, v: run_trunk_int8(cfg, q, v, dtype=dtype))
    return lambda v: fn(qpack, v), qpack
