"""R(2+1)D-18 CT encoder.

Parity target: ``model/dim3/resnet2plus1D.py:6-17`` — 1→3ch Conv3d stem
(kernel (3,2,2), stride (1,2,2)) + torchvision ``r2plus1d_18`` whose fc head
is replaced by Linear→ReLU→Linear→ReLU, returning a (B, 512) vector.

R(2+1)D factorises each 3-D conv into a spatial (1,3,3) conv + BN + ReLU +
temporal (3,1,1) conv with the torchvision midplane formula.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .ct_mc3 import _ConvBN, DepthFoldedConv, LowChannelConv3D


class _Conv2Plus1D(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    temporal_mode: str = "dfold"
    fwd_lowering: str = "conv3d"
    # torchvision computes midplanes ONCE per block from (inplanes,
    # planes) and reuses it for conv2 (video/resnet.py BasicBlock) —
    # deriving it from each conv's own input width diverges on the
    # stage-transition blocks (in != out) and breaks checkpoint import
    mid: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_f = x.shape[-1]
        mid = self.mid if self.mid is not None else (
            in_f * self.features * 3 * 3 * 3) // (
            in_f * 3 * 3 + 3 * self.features)
        y = _ConvBN(mid, (1, 3, 3), (1, self.stride, self.stride),
                    (0, 1, 1), dtype=self.dtype, name="spatial")(x, train)
        y = nn.relu(y)
        mode, fwd = self.temporal_mode, self.fwd_lowering
        if mode == "auto":
            # Mode-dependent lowering (zoo A/B, BENCH_NOTES r3): the train
            # step wants the all-fold form (653.6 ms/step vs 682.2 hybrid
            # / 696.8 native — the custom_vjp hybrid blocks the fold's
            # fusion into its BN/relu producers, keeping only a third of
            # the grad win), while eval wants the native 3-D emitter
            # (122.6 ms/patient vs 125.1 hybrid / 151.1 fold).  train and
            # eval are separate jitted programs over the SAME param tree,
            # and the lowerings are parity-exact (tests below), so each
            # program takes its measured winner.
            mode, fwd = ("dfold", "fold") if train else ("conv3d", None)
        if mode != "conv3d":
            # (3,1,1) temporal conv as depth-tap GEMMs (dfold with 1x1
            # spatial = concat 3 shifted views, one (3*Cin, F)
            # contraction): same param name/shape as nn.Conv, but rides
            # the MXU matmul path instead of XLA's 3-D conv gradient
            # emitters (the MC3 r2 profile measured those at ~8% MFU;
            # zoo bench r3 measured this trunk's train/eval ratio at 5.7x
            # vs MC3's 3.8x before this lowering)
            return DepthFoldedConv(self.features, (3, 1, 1),
                                   (self.stride, 1, 1), (1, 0, 0),
                                   mode=mode, fwd_lowering=fwd,
                                   dtype=self.dtype, name="temporal")(y)
        return nn.Conv(self.features, (3, 1, 1), (self.stride, 1, 1),
                       padding=((1, 1), (0, 0), (0, 0)), use_bias=False,
                       dtype=self.dtype, name="temporal")(y)


class _R2Plus1DBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    temporal_mode: str = "dfold"
    fwd_lowering: str = "conv3d"

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_f = x.shape[-1]
        mid = (in_f * self.features * 3 * 3 * 3) // (
            in_f * 3 * 3 + 3 * self.features)
        y = _Conv2Plus1D(self.features, self.stride, self.dtype,
                         self.temporal_mode, self.fwd_lowering, mid=mid,
                         name="conv1")(x, train)
        y = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 name="bn1")(y))
        y = _Conv2Plus1D(self.features, 1, self.dtype, self.temporal_mode,
                         self.fwd_lowering, mid=mid,
                         name="conv2")(y, train)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(y)
        if x.shape[-1] != self.features or self.stride != 1:
            x = _ConvBN(self.features, (1, 1, 1), (self.stride,) * 3,
                        (0, 0, 0), dtype=self.dtype,
                        name="downsample")(x, train)
        return nn.relu(x + y)


class Resnet2plus1D_18(nn.Module):
    """Input (B, D, H, W, 1) → (B, 512) pooled feature (reference head).

    ``temporal_mode``: lowering for the (3,1,1) temporal convs —
    'dfold'/'dsum'/'dshift' compute them as depth-tap GEMMs (identical
    numerics + param tree, see DepthFoldedConv), 'conv3d' keeps the
    native 3-D emitter, 'auto' (the default) picks per jitted program:
    all-fold in train, native 3-D in eval.  Measured ruling (zoo bench,
    BENCH_NOTES r3): train 653.6 (fold) / 682.2 (custom_vjp hybrid) /
    696.8 (native) ms/step; eval 122.6 (native) / 125.1 (hybrid) / 151.1
    (fold) ms/patient — the hybrid keeps only a third of the fold's grad
    win because its custom_vjp boundary blocks fusion into the BN/relu
    producers, so mode-dependent lowering beats any single form."""
    remat: bool = True
    dtype: jnp.dtype = jnp.float32
    temporal_mode: str = "auto"
    fwd_lowering: str = "conv3d"
    layers: tuple = (2, 2, 2, 2)     # blocks per stage (18-layer default;
                                     # smaller for tests/dry-runs)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # reference stem: Conv3d(1→3, (3,2,2), s(1,2,2), p(1,0,0))
        x = LowChannelConv3D(3, (3, 2, 2), (1, 2, 2),
                             ((1, 1), (0, 0), (0, 0)), dtype=self.dtype,
                             name="downsampling")(x)
        # R2Plus1dStem
        x = nn.relu(_ConvBN(45, (1, 7, 7), (1, 2, 2), (0, 3, 3),
                            dtype=self.dtype, name="stem_s")(x, train))
        x = nn.relu(_ConvBN(64, (3, 1, 1), (1, 1, 1), (1, 0, 0),
                            dtype=self.dtype,
                            temporal_mode=self.temporal_mode,
                            name="stem_t")(x, train))
        block = _R2Plus1DBlock
        if self.remat:
            block = nn.remat(_R2Plus1DBlock, static_argnums=(2,))
        for i, (feats, n_blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            for b in range(n_blocks):
                stride = 2 if (i > 0 and b == 0) else 1
                x = block(feats, stride, self.dtype, self.temporal_mode,
                          self.fwd_lowering,
                          name=f"layer{i + 1}_{b}")(x, train)
        x = x.mean(axis=(1, 2, 3))                      # global avg pool
        x = nn.relu(nn.Dense(512, dtype=self.dtype, name="fc0")(x))
        x = nn.relu(nn.Dense(512, dtype=self.dtype, name="fc1")(x))
        return x
