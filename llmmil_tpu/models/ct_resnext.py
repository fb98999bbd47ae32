"""3-D ResNeXt-50/101/152 (cardinality 32).

Parity target: ``model/dim3/resnext101.py:83-216`` — self-contained 3-D
ResNeXt with grouped bottleneck convs and a fine-tune parameter selector
(the reference keeps it as dead code; provided here for completeness).
NDHWC; grouped convs via feature_group_count.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .ct_mc3 import _ConvBN

LAYOUTS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class _ResNeXtBottleneck3D(nn.Module):
    mid: int
    out: int
    stride: int = 1
    cardinality: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = (self.stride,) * 3
        y = nn.relu(_ConvBN(self.mid, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                            dtype=self.dtype, name="conv1")(x, train))
        y = nn.Conv(self.mid, (3, 3, 3), s,
                    padding=((1, 1),) * 3, use_bias=False,
                    feature_group_count=self.cardinality, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype, name="bn2")(y))
        y = _ConvBN(self.out, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                    dtype=self.dtype, name="conv3")(y, train)
        if x.shape[-1] != self.out or self.stride != 1:
            x = _ConvBN(self.out, (1, 1, 1), s, (0, 0, 0),
                        dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(x + y)


class ResNeXt3D(nn.Module):
    """(B, D, H, W, C) → (B, num_classes) logits (reference head)."""
    depth: int = 101
    cardinality: int = 32
    num_classes: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        layers = LAYOUTS[self.depth]
        x = nn.relu(_ConvBN(64, (7, 7, 7), (2, 2, 2), (3, 3, 3),
                            dtype=self.dtype, name="stem")(x, train))
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
        mids = (128, 256, 512, 1024)
        outs = (256, 512, 1024, 2048)
        for i, (n_blocks, mid, out) in enumerate(zip(layers, mids, outs)):
            for b in range(n_blocks):
                stride = 2 if (i > 0 and b == 0) else 1
                x = _ResNeXtBottleneck3D(
                    mid, out, stride, self.cardinality, self.dtype,
                    name=f"layer{i + 1}_{b}")(x, train)
        x = x.mean(axis=(1, 2, 3))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


def finetune_param_labels(params, ft_begin_index: int):
    """Fine-tune selector (resnext101.py:190-216): label params in layers ≥
    ft_begin_index (plus fc) 'train', the rest 'frozen' — usable directly
    with optax.multi_transform."""
    import jax

    def label(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        if top == "fc":
            return "train"
        if top.startswith("layer"):
            layer_i = int(top[5])
            return "train" if layer_i >= ft_begin_index else "frozen"
        return "frozen" if ft_begin_index > 0 else "train"

    return jax.tree_util.tree_map_with_path(label, params)
