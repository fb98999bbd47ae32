"""2-D ResNet-18 classifier.

Parity target: ``model/dim2/resnet18.py:6-20`` — torchvision resnet18 with a
sigmoid/softmax head (unused by the reference's entry points; provided for
inventory completeness).  NHWC.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class _BasicBlock2D(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv_bn(y, stride, name):
            y = nn.Conv(self.features, (3, 3), (stride, stride),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name=f"{name}_conv")(y)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                name=f"{name}_bn")(y)

        y = nn.relu(conv_bn(x, self.stride, "c1"))
        y = conv_bn(y, 1, "c2")
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1),
                        (self.stride, self.stride), use_bias=False,
                        dtype=self.dtype, name="down_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name="down_bn")(x)
        return nn.relu(x + y)


class Resnet18_2D(nn.Module):
    """(B, H, W, C) → (B, num_classes) probabilities."""
    num_classes: int = 2
    activation: str = "sigmoid"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="stem")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype, name="stem_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for i, feats in enumerate((64, 128, 256, 512)):
            for b in range(2):
                stride = 2 if (i > 0 and b == 0) else 1
                x = _BasicBlock2D(feats, stride, self.dtype,
                                  name=f"layer{i + 1}_{b}")(x, train)
        x = x.mean(axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="fc")(x)
        if self.activation == "sigmoid":
            return nn.sigmoid(logits)
        return nn.softmax(logits, axis=-1)
