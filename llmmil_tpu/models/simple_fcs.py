"""Clinical-information MLP encoders.

Parity targets: ``model/dim1/simpleFCs_v1.py``, ``_v1d``, ``_v2``, ``_v2d``.
All map a clinical vector to a 512-d embedding; the "d" variants consume the
tiled ("duplicated") input the data pipeline produces
(``dataset.py:428-431,445-448``).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


class SimpleFCsV1(nn.Module):
    """MLP n→n→512 with ReLU (simpleFCs_v1.py:7-16)."""
    n_features: int = 9
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.n_features, dtype=self.dtype, name="fc0")(x))
        return nn.relu(nn.Dense(512, dtype=self.dtype, name="fc1")(x))


class SimpleFCsV1d(nn.Module):
    """Linear on the tiled v1 vector → 512 (simpleFCs_v1d.py:8-16)."""
    n_features: int = 9
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = self.n_features * math.ceil(512 / self.n_features)
        assert x.shape[-1] == in_dim, (x.shape, in_dim)
        return nn.relu(nn.Dense(512, dtype=self.dtype, name="fc0")(x))


class SimpleFCsV2(nn.Module):
    """MLP 27→27→512 on one-hot input (simpleFCs_v2.py:7-17)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(27, dtype=self.dtype, name="fc0")(x))
        return nn.relu(nn.Dense(512, dtype=self.dtype, name="fc1")(x))


class SimpleFCsV2d(nn.Module):
    """Linear 27·19→512 on tiled one-hot input (simpleFCs_v2d.py:8-14)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert x.shape[-1] == 27 * 19, x.shape
        return nn.relu(nn.Dense(512, dtype=self.dtype, name="fc0")(x))
