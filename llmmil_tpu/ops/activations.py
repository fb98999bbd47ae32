"""Activation functions."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's QuickGELU: ``x * sigmoid(1.702 x)`` (clip/model.py:162-164)."""
    return x * jax.nn.sigmoid(1.702 * x)
