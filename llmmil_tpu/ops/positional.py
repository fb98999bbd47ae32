"""Sinusoidal positional encodings.

Matches the reference's precomputed PE table (``model/aggregator.py:99-106``):
``pe[p, 2i] = sin(p * exp(-2i ln(10000)/d))``, ``pe[p, 2i+1] = cos(...)``.

TPU note: the reference materialises a (1, 100000, 512) fp32 table on host and
slices it per forward; here the slice length is static under ``jit`` so we
compute exactly the rows needed — XLA constant-folds it into the program, no
HBM-resident 200 MB table.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _pe_table(length: int, dim: int) -> np.ndarray:
    position = np.arange(length, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, dim, 2, dtype=np.float32)
                      * -(math.log(10000.0) / dim))
    pe = np.zeros((length, dim), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


def sinusoidal_pe(length: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """(length, dim) sinusoidal PE, identical numerics to the torch table."""
    return jnp.asarray(_pe_table(int(length), int(dim)), dtype=dtype)
