"""Host-side CT augmentations (numpy/scipy).

Parity target: the MONAI transform stack (``dataset.py:190-228``):
RandAffined ±10° rotation (nearest, p=0.2), RandGaussianNoised (σ=0.05,
p=0.1), RandFlipd over all axes (p=0.2 each).  Same distributions, explicit
``np.random.RandomState`` so a fixed seed reproduces a pipeline run.
"""

from __future__ import annotations

import math

import numpy as np


def rand_rotate(img: np.ndarray, rng: np.random.RandomState,
                prob: float = 0.2, max_deg: float = 10.0,
                mask: np.ndarray | None = None):
    """In-plane rotation by U(−10°, 10°), nearest-neighbour (applied jointly
    to image+mask like the mask-aware variant, dataset.py:209-228)."""
    if rng.rand() >= prob:
        return (img, mask) if mask is not None else img
    try:
        from scipy.ndimage import rotate
    except ImportError:                                  # pragma: no cover
        return (img, mask) if mask is not None else img
    deg = rng.uniform(-max_deg, max_deg)
    out = rotate(img, deg, axes=(1, 2), reshape=False, order=0,
                 mode="constant")
    if mask is not None:
        m = rotate(mask, deg, axes=(1, 2), reshape=False, order=0,
                   mode="constant")
        return out, m
    return out


def rand_gaussian_noise(img: np.ndarray, rng: np.random.RandomState,
                        prob: float = 0.1, std: float = 0.05) -> np.ndarray:
    if rng.rand() >= prob:
        return img
    return img + rng.normal(0.0, std, img.shape).astype(img.dtype)


def rand_flip(img: np.ndarray, rng: np.random.RandomState,
              prob: float = 0.2, mask: np.ndarray | None = None):
    """Independent flip per axis with p=0.2 (dataset.py:196-207)."""
    for ax in range(img.ndim):
        if rng.rand() < prob:
            img = np.flip(img, axis=ax)
            if mask is not None:
                mask = np.flip(mask, axis=ax)
    img = np.ascontiguousarray(img)
    if mask is not None:
        return img, np.ascontiguousarray(mask)
    return img


def augment_ct(img: np.ndarray, rng: np.random.RandomState,
               mask: np.ndarray | None = None):
    """Full train-time CT augmentation chain."""
    if mask is not None:
        img, mask = rand_rotate(img, rng, mask=mask)
        img = rand_gaussian_noise(img, rng)
        img, mask = rand_flip(img, rng, mask=mask)
        return img, mask
    img = rand_rotate(img, rng)
    img = rand_gaussian_noise(img, rng)
    return rand_flip(img, rng)
