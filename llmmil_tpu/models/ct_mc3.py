"""3-D CT encoders: MC3-18 video ResNet features.

Parity target: ``model/dim3/resnetMC3.py:6-32`` — a 1→3-channel Conv3d
"downsampling" stem (kernel/stride keyed on CT spacing) feeding torchvision's
``mc3_18`` trunk, returning the **layer4 feature map** (no pooling).

TPU-native design: NDHWC layout throughout (channels-last is the MXU-friendly
conv layout), BatchNorm with running stats in a ``batch_stats`` collection,
optional ``jax.checkpoint`` rematerialisation per stage to bound HBM at
(160, 512, 512) volumes.  MC3 = 3-D convs in stem+layer1, spatial-only
(1,3,3) convs in layers 2-4 (torchvision VideoResNet semantics).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def halo_pad_depth(x, pd: int, axis_name: str):
    """Depth-axis halo exchange replacing ``jnp.pad(..., pd)`` under a
    ``shard_map`` whose ``axis_name`` shards the depth (D) axis.

    Each shard receives ``pd`` boundary slices from its mesh neighbours via
    ``ppermute``; the chain ends receive zeros (ppermute's semantics for
    absent sources), which is exactly the zero padding the unsharded conv
    applies at the physical volume boundary — so sharded and unsharded
    numerics are identical.  x: (B, D_local, H, W, C) → D_local + 2·pd.
    """
    n = jax.lax.axis_size(axis_name)
    left = jax.lax.ppermute(x[:, -pd:], axis_name,
                            [(i, i + 1) for i in range(n - 1)])
    right = jax.lax.ppermute(x[:, :pd], axis_name,
                             [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([left, x, right], axis=1)


def im2col_conv(x, kernel, bias, strides, padding):
    """Low-channel 3-D conv as patches + matmul.

    XLA's TPU weight-gradient for 3-D convs with tiny channel counts
    relayouts the input into a (2,128)-tiled buffer that pads the size-1
    dims 256× (21 GiB for a (1,160,512,512,1) volume — measured OOM); the
    im2col formulation compiles to 5.3 GiB and is numerically identical.
    kernel: (kD, kH, kW, C_in, C_out) NDHWC-style.
    """
    kd, kh, kw, cin, cout = kernel.shape
    patches = jax.lax.conv_general_dilated_patches(
        x, (kd, kh, kw), strides, padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    # patches features are channel-major: (C_in, kD, kH, kW)
    w = jnp.transpose(kernel, (3, 0, 1, 2, 4)).reshape(-1, cout)
    out = patches @ w.astype(patches.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


class LowChannelConv3D(nn.Module):
    """nn.Conv-compatible module (same param shapes) computing the forward
    via :func:`im2col_conv` — for 1-3-channel stems on big volumes.

    ``shard_axis``: mesh axis name sharding the depth dim (inside a
    shard_map) — boundary slices arrive by halo exchange instead of the
    depth zero-padding, keeping numerics identical to unsharded."""
    features: int
    kernel: tuple
    stride: tuple
    padding: tuple            # ((lo,hi),)*3
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    shard_axis: str | None = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (*self.kernel, cin, self.features))
        b = (self.param("bias", nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        x = x.astype(self.dtype)
        padding = self.padding
        if self.shard_axis is not None:
            pd = self.padding[0][0]
            assert self.stride[0] == 1 and self.kernel[0] == 2 * pd + 1, (
                "depth sharding needs stride-1, centred depth kernels")
            if pd:
                x = halo_pad_depth(x, pd, self.shard_axis)
            padding = ((0, 0),) + tuple(self.padding[1:])
        return im2col_conv(x, k.astype(self.dtype), b, self.stride, padding)


class DepthFoldedConv(nn.Module):
    """(kD,kH,kW) 3-D conv computed by folding the depth taps into 2-D convs.

    Numerically identical to ``nn.Conv`` with the same 5-D kernel param
    (same name/shape, so checkpoints and the torch importer see no
    difference).  XLA's TPU emitters run 3-D conv *gradients* at ~8% MFU
    (BENCH_NOTES r2 profile: the entire 2x train-step gap); the folded forms
    ride the far better tuned 2-D conv paths instead:

    - ``dfold``: concat the kD depth-shifted views on channels, ONE 2-D conv
      with kD*C input channels (deepest MXU contraction; kD x activation
      materialisation);
    - ``dsum``: kD separate 2-D convs summed (no activation blowup);
    - ``dshift``: ONE 2-D conv over ALL padded slices with kD*F OUTPUT
      channels (the per-tap kernels stacked on cout), then kD shifted
      slab adds.  The TPU conv emitters' efficiency tracks cout width
      (measured: cout 64 -> 21% MFU, 128 -> 47%, 512 -> 82%), so widening
      cout 64 -> 192 in MC3's layer1 is the fastest form.

    ``fwd_lowering='conv3d'`` (dfold mode only): emit the FORWARD as a
    native 3-D conv but keep the dfold 2-D emitters for both gradients,
    via custom_vjp + ``jax.linear_transpose`` of the fold form (no primal
    recompute in the backward).  Measured ruling (BENCH_NOTES r3): wins
    in ISOLATION at MC3-layer1's shape (12.0 vs 16.4 ms — the fold
    concat costs ~5 ms when fed from cold HBM) but LOSES in-model
    (flagship eval 83 vs 72 ms; scripts/bench_train.py --eval A/B,
    reproduced) because XLA fuses the fold concat into the preceding
    BN/relu producers, making it nearly free in context while the 3-D
    emitter's own forward is slower than the fused fold+2-D pipeline.
    'fold' stays the default; the hybrid is kept parity-tested
    (tests/test_depthfold.py) as the recorded negative result.
    Low-channel inputs (cin < 8) always keep the fold form — XLA's 3-D
    emitters pathologically relayout size-1/3 channel dims (the 21 GiB
    stem buffer of round 1).
    """
    features: int
    kernel: tuple          # (kD, kH, kW), kD > 1
    stride: tuple          # (sD, sH, sW)
    padding: tuple         # (pD, pH, pW) symmetric ints
    mode: str = "dfold"
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    shard_axis: str | None = None
    conv_backend: str = "xla"   # 'pallas' routes 3x3 stride-1 folded convs
                                # through ops/pallas/conv3x3 (MC3 layer1's
                                # cout-64 shape, where XLA sits at ~21% MFU)
    fwd_lowering: str = "fold"  # 'conv3d' swaps the dfold forward for the
                                # native 3-D conv emitter (grads stay dfold)

    @nn.compact
    def __call__(self, x):
        kd, kh, kw = self.kernel
        sd, sh, sw = self.stride
        pd, ph, pw = self.padding
        cin = x.shape[-1]
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (kd, kh, kw, cin, self.features))
        b_ = (self.param("bias", nn.initializers.zeros, (self.features,))
              if self.use_bias else None)
        b, d, h, w, _ = x.shape
        if self.shard_axis is not None:
            assert sd == 1 and kd == 2 * pd + 1, (
                "depth sharding needs stride-1, centred depth kernels")
            xp = halo_pad_depth(x, pd, self.shard_axis) if pd else x
            dout = d
        else:
            xp = jnp.pad(x, ((0, 0), (pd, pd), (0, 0), (0, 0), (0, 0))) \
                if pd else x
            dout = (d + 2 * pd - kd) // sd + 1
        span = sd * (dout - 1) + 1
        dt = self.dtype
        k = k.astype(dt)

        # 'pallas' gates on a TPU backend (the kernel is Mosaic-only);
        # 'pallas_interpret' forces the interpreter for CPU tests.  One
        # gate shared by conv2d and the conv3d-hybrid suppression below —
        # they must always agree on the backend in use.
        use_pl = (self.conv_backend == "pallas_interpret"
                  or (self.conv_backend == "pallas"
                      and jax.default_backend() == "tpu"))

        def conv2d(inp, ker):
            if (use_pl and ker.shape[:2] == (3, 3)
                    and (sh, sw) == (1, 1) and (ph, pw) == (1, 1)):
                from ..ops.pallas.conv3x3 import conv3x3
                return conv3x3(inp.astype(dt), ker, 16,
                               self.conv_backend == "pallas_interpret")
            return jax.lax.conv_general_dilated(
                inp.astype(dt), ker, (sh, sw), ((ph, ph), (pw, pw)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        if self.mode == "dfold":
            def fold_form(xp_, k_):
                parts = [xp_[:, i:i + span:sd] for i in range(kd)]
                y = jnp.concatenate(parts, axis=-1)   # (B,Dout,H,W,kd*C)
                y = y.reshape(b * dout, h, w, kd * cin)
                w2 = jnp.transpose(k_, (1, 2, 0, 3, 4)).reshape(
                    kh, kw, kd * cin, self.features)
                return conv2d(y, w2)

            # the 3-D fwd emitter wins only at the half-lane cout-64
            # shapes (12.0 vs 16.4 ms at layer1); at cout>=128 the fold
            # form is already faster (1.98 vs 2.40 ms at the 128-ch
            # temporal shape — scripts/bench_dpack3d.py stage sweep).
            # Spatially-pointwise (kD,1,1) kernels (R(2+1)D's temporal
            # convs) take the hybrid at ANY width: there the 3-D fwd
            # emitter beats the fold fwd in-model (+28 ms across the
            # R2+1D eval, zoo bench r3) while the fold GRADS beat the
            # 3-D ones (-71 ms across its train step)
            if (self.fwd_lowering == "conv3d" and not use_pl
                    and cin >= 8 and (self.features < 128
                                      or (kh == 1 and kw == 1))):
                def conv3d_form(xp_, k_):
                    y = jax.lax.conv_general_dilated(
                        xp_.astype(dt), k_, (sd, sh, sw),
                        ((0, 0), (ph, ph), (pw, pw)),
                        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                    return y.reshape(b * dout, *y.shape[2:])

                @jax.custom_vjp
                def hybrid(xp_, k_):
                    return conv3d_form(xp_, k_)

                def hybrid_fwd(xp_, k_):
                    return conv3d_form(xp_, k_), (xp_, k_)

                def hybrid_bwd(res, g):
                    xp_, k_ = res
                    dxp = jax.linear_transpose(
                        lambda a: fold_form(a, k_), xp_)(g)[0]
                    dk = jax.linear_transpose(
                        lambda w_: fold_form(xp_, w_), k_)(g)[0]
                    return dxp, dk

                hybrid.defvjp(hybrid_fwd, hybrid_bwd)
                out = hybrid(xp, k)
            else:
                out = fold_form(xp, k)
        elif self.mode == "dshift":
            # one wide conv over every padded slice, cout = kd*F, then the
            # kd depth-shifted slabs sum:  out[do] = Σ_i y[do·sd + i, i·F:]
            dp = xp.shape[1]
            w2 = jnp.transpose(k, (1, 2, 3, 0, 4)).reshape(
                kh, kw, cin, kd * self.features)
            y = conv2d(xp.reshape(b * dp, h, w, cin), w2)
            y = y.reshape(b, dp, *y.shape[1:])
            f = self.features
            out = y[:, 0:span:sd, :, :, 0:f]
            for i in range(1, kd):
                out = out + y[:, i:i + span:sd, :, :, i * f:(i + 1) * f]
            out = out.reshape(b * dout, *out.shape[2:])
        else:                                          # dsum
            out = conv2d(xp[:, 0:span:sd].reshape(b * dout, h, w, cin), k[0])
            for i in range(1, kd):
                out = out + conv2d(
                    xp[:, i:i + span:sd].reshape(b * dout, h, w, cin), k[i])
        if b_ is not None:
            out = out + b_.astype(out.dtype)
        return out.reshape(b, dout, *out.shape[1:])


class _ConvBN(nn.Module):
    features: int
    kernel: tuple
    stride: tuple
    padding: tuple
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    temporal_mode: str = "conv3d"   # 'conv3d'|'dfold'|'dsum'|'dshift'
    shard_axis: str | None = None   # depth-sharding mesh axis (sp_ct)
    bn_axes: tuple | None = None    # BN sync axes; None → (shard_axis,).
                                    # Depth-sharded TRAINING under a 2-D
                                    # ('data','depth') shard_map syncs BN
                                    # over BOTH axes so stats equal the
                                    # global-batch DP step's (train/step.py)
    conv_backend: str = "xla"
    fwd_lowering: str = "fold"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if (len(self.kernel) == 3 and self.kernel[0] > 1
                and self.temporal_mode != "conv3d"):
            x = DepthFoldedConv(self.features, self.kernel, self.stride,
                                self.padding, mode=self.temporal_mode,
                                use_bias=self.use_bias, dtype=self.dtype,
                                shard_axis=self.shard_axis,
                                conv_backend=self.conv_backend,
                                fwd_lowering=self.fwd_lowering,
                                name="conv")(x)
        elif (len(self.kernel) == 3 and self.kernel[0] > 1
                and self.shard_axis is not None):
            # sharded 'conv3d' temporal path: halo-exchange the depth
            # boundary, then conv with no depth padding
            pd = self.padding[0]
            assert self.stride[0] == 1 and self.kernel[0] == 2 * pd + 1, (
                "depth sharding needs stride-1, centred depth kernels")
            y = halo_pad_depth(x, pd, self.shard_axis) if pd else x
            x = nn.Conv(self.features, self.kernel, self.stride,
                        padding=((0, 0),) + tuple(
                            (p, p) for p in self.padding[1:]),
                        use_bias=self.use_bias, dtype=self.dtype,
                        name="conv")(y)
        elif (len(self.kernel) == 3 and self.kernel[0] == 1
                and self.stride[0] == 1 and self.padding[0] == 0):
            # depth-independent (1, kH, kW) conv: fold D into batch and run
            # a 2-D conv — numerically identical, and XLA's 2-D conv paths
            # (fwd and grads) are far better tuned on TPU than 3-D ones.
            # (the kernel param becomes 4-D; the torch importer squeezes
            # the kD=1 axis to match)
            b, d, h, w, c = x.shape
            y = x.reshape(b * d, h, w, c)
            y = nn.Conv(self.features, self.kernel[1:], self.stride[1:],
                        padding=tuple((p, p) for p in self.padding[1:]),
                        use_bias=self.use_bias, dtype=self.dtype,
                        name="conv")(y)
            x = y.reshape(b, d, *y.shape[1:])
        else:
            x = nn.Conv(self.features, self.kernel, self.stride,
                        padding=tuple((p, p) for p in self.padding),
                        use_bias=self.use_bias, dtype=self.dtype,
                        name="conv")(x)
        bn_axes = (self.bn_axes if self.bn_axes is not None
                   else self.shard_axis)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype,
                            axis_name=bn_axes, name="bn")(x)


class BasicBlock3D(nn.Module):
    """Video-ResNet BasicBlock; ``temporal=True`` → (3,3,3) convs
    (Conv3DSimple), else (1,3,3) (Conv3DNoTemporal)."""
    features: int
    stride: int = 1
    temporal: bool = True
    dtype: jnp.dtype = jnp.float32
    temporal_mode: str = "conv3d"
    shard_axis: str | None = None
    bn_axes: tuple | None = None
    conv_backend: str = "xla"
    fwd_lowering: str = "fold"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.temporal:
            k, s, p = (3, 3, 3), (self.stride,) * 3, (1, 1, 1)
        else:
            k = (1, 3, 3)
            s = (1, self.stride, self.stride)
            p = (0, 1, 1)
        y = _ConvBN(self.features, k, s, p, dtype=self.dtype,
                    temporal_mode=self.temporal_mode,
                    shard_axis=self.shard_axis, bn_axes=self.bn_axes,
                    conv_backend=self.conv_backend,
                    fwd_lowering=self.fwd_lowering, name="conv1")(x, train)
        y = nn.relu(y)
        y = _ConvBN(self.features, k, (1, 1, 1), p, dtype=self.dtype,
                    temporal_mode=self.temporal_mode,
                    shard_axis=self.shard_axis, bn_axes=self.bn_axes,
                    conv_backend=self.conv_backend,
                    fwd_lowering=self.fwd_lowering, name="conv2")(y, train)
        if x.shape[-1] != self.features or self.stride != 1:
            x = _ConvBN(self.features, (1, 1, 1), s, (0, 0, 0),
                        dtype=self.dtype, shard_axis=self.shard_axis,
                        bn_axes=self.bn_axes, name="downsample")(x, train)
        return nn.relu(x + y)


class VideoResNetFeatures(nn.Module):
    """MC3-18 trunk (stem + layers 1-4), returning the layer4 NDHWC map.

    ``temporal_layers`` selects which stages use full 3-D convs: MC3 is
    (True, False, False, False); an all-True tuple gives R3D-18.
    """
    layers: Sequence[int] = (2, 2, 2, 2)
    channels: Sequence[int] = (64, 128, 256, 512)
    temporal_layers: Sequence[bool] = (True, False, False, False)
    remat: str | bool = True     # True/'all' | 'early' (stages 1-2) |
                                 # 'layer2' (stage 2 only) | False
    dtype: jnp.dtype = jnp.float32
    temporal_mode: str = "conv3d"
    shard_axis: str | None = None
    bn_axes: tuple | None = None
    conv_backend: str = "xla"
    fwd_lowering: str = "fold"

    @nn.compact
    def __call__(self, x, train: bool = False):
        # BasicStem: Conv(3→64, (3,7,7), s(1,2,2), p(1,3,3)) + BN + ReLU
        # (cin=3: DepthFoldedConv's low-channel gate keeps the fold form
        # regardless of fwd_lowering)
        x = nn.relu(_ConvBN(64, (3, 7, 7), (1, 2, 2), (1, 3, 3),
                            dtype=self.dtype,
                            temporal_mode=self.temporal_mode,
                            shard_axis=self.shard_axis,
                            bn_axes=self.bn_axes,
                            fwd_lowering=self.fwd_lowering,
                            name="stem")(x, train))
        remat_block = nn.remat(BasicBlock3D, static_argnums=(2,))
        for i, (n_blocks, feats, temporal) in enumerate(
                zip(self.layers, self.channels, self.temporal_layers)):
            use_remat = (self.remat in (True, "all")
                         or (self.remat == "early" and i < 2)
                         or (self.remat == "layer2" and i == 1))
            block = remat_block if use_remat else BasicBlock3D
            for b in range(n_blocks):
                stride = 2 if (i > 0 and b == 0) else 1
                x = block(feats, stride, temporal, self.dtype,
                          temporal_mode=self.temporal_mode,
                          shard_axis=self.shard_axis,
                          bn_axes=self.bn_axes,
                          conv_backend=self.conv_backend,
                          fwd_lowering=self.fwd_lowering,
                          name=f"layer{i + 1}_{b}")(x, train)
        return x


class ResnetMC3_18(nn.Module):
    """Reference ``ResnetMC3_18``: spacing-keyed 1→3ch Conv3d stem
    (resnetMC3.py:10-14) + MC3-18 trunk, returning the layer4 map.

    Input: (B, D, H, W, 1) NDHWC CT volume in [0, 1).
    Output: (B, D, H', W', 512) NDHWC feature map.
    """
    spacing_xy: float = 0.6869
    remat: str | bool = True
    dtype: jnp.dtype = jnp.float32
    # blocks per stage; the mc3_18 default — reduced layouts are a
    # debug/dryrun knob (Config.ct_layers), not a reference shape
    layers: Sequence[int] = (2, 2, 2, 2)
    temporal_mode: str = "conv3d"
    shard_axis: str | None = None
    bn_axes: tuple | None = None
    conv_backend: str = "xla"
    fwd_lowering: str = "fold"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.spacing_xy == 2.0:
            k, s = (3, 3, 3), (1, 1, 1)
        else:
            # kernel (3,4,4), stride (1,2,2), padding 1 → floor((H-2)/2)+1
            k, s = (3, 4, 4), (1, 2, 2)
        if self.temporal_mode != "conv3d":
            # depth-folded 2-D lowering: 15x faster bwd and 6x less HBM
            # than the im2col form at (160,512,512) (BENCH_NOTES r2,
            # scripts/bench_downsample.py); identical param tree
            x = DepthFoldedConv(3, k, s, (1, 1, 1),
                                mode=self.temporal_mode, use_bias=True,
                                dtype=self.dtype,
                                shard_axis=self.shard_axis,
                                name="downsampling")(x)
        else:
            x = LowChannelConv3D(3, k, s, ((1, 1), (1, 1), (1, 1)),
                                 use_bias=True, dtype=self.dtype,
                                 shard_axis=self.shard_axis,
                                 name="downsampling")(x)
        return VideoResNetFeatures(
            layers=self.layers,
            remat=self.remat, dtype=self.dtype,
            temporal_mode=self.temporal_mode, shard_axis=self.shard_axis,
            bn_axes=self.bn_axes, conv_backend=self.conv_backend,
            fwd_lowering=self.fwd_lowering, name="trunk")(x, train)


class MedicalNetFeatures(nn.Module):
    """Bottleneck 3-D ResNet returning the layer2 map — the capability match
    for the reference's MedicalNet ResNet-101 path (``model/dim3/
    medicalNet.py:5-55``, external weights absent from the reference repo).

    ResNet-101 layout: bottleneck blocks (3, 4, 23, 3); the reference only
    consumes layer2 output (512 channels after expansion), so stages 3-4 are
    never built.
    """
    layers: Sequence[int] = (3, 4)
    dtype: jnp.dtype = jnp.float32
    # depth-tap lowering for the (7,7,7) stem and (3,3,3) bottleneck convs
    # (identical numerics/param tree — DepthFoldedConv); 'conv3d' keeps the
    # native emitters
    temporal_mode: str = "dfold"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(_ConvBN(64, (7, 7, 7), (2, 2, 2), (3, 3, 3),
                            dtype=self.dtype,
                            temporal_mode=self.temporal_mode,
                            name="stem")(x, train))
        # explicit (1,1) padding: torch MaxPool3d(3, 2, padding=1) window
        # alignment (SAME would shift windows and break weight-port parity)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2),
                        padding=((1, 1), (1, 1), (1, 1)))
        feats = (64, 128)
        for i, (n_blocks, f) in enumerate(zip(self.layers, feats)):
            for b in range(n_blocks):
                stride = 2 if (i > 0 and b == 0) else 1
                x = _Bottleneck3D(f, stride, self.dtype,
                                  temporal_mode=self.temporal_mode,
                                  name=f"layer{i + 1}_{b}")(x, train)
        return x


class _Bottleneck3D(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    temporal_mode: str = "dfold"

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_f = self.features * 4
        s = (self.stride,) * 3
        y = nn.relu(_ConvBN(self.features, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                            dtype=self.dtype, name="conv1")(x, train))
        y = nn.relu(_ConvBN(self.features, (3, 3, 3), s, (1, 1, 1),
                            dtype=self.dtype,
                            temporal_mode=self.temporal_mode,
                            name="conv2")(y, train))
        y = _ConvBN(out_f, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                    dtype=self.dtype, name="conv3")(y, train)
        if x.shape[-1] != out_f or self.stride != 1:
            x = _ConvBN(out_f, (1, 1, 1), s, (0, 0, 0),
                        dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(x + y)
