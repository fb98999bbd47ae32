"""Augmentation parity: the dependency-free gather rotate must reproduce
scipy.ndimage.rotate(order=0, reshape=False, mode='constant') pixel-exactly
(the reference's RandAffined nearest-mode rotation, dataset.py:190-228),
and the float32 noise draw must stay N(0, std) and deterministic."""

import numpy as np
import pytest

from llmmil_tpu.data.augment import (_rotate_inplane_nearest, rand_flip,
                                     rand_gaussian_noise, rand_rotate)

def test_rotate_matches_scipy_pixel_exact():
    # only THIS test needs scipy (the production path is scipy-free by
    # design — a module-level skip would silence the scipy-free tests
    # below exactly on the hosts they were built for)
    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    rng = np.random.RandomState(0)
    for _ in range(20):
        deg = float(rng.uniform(-10, 10))
        img = rng.rand(3, 33, 47).astype(np.float32)
        ref = scipy_ndimage.rotate(img, deg, axes=(1, 2), reshape=False,
                                   order=0, mode="constant")
        got = _rotate_inplane_nearest(img, deg)
        assert (ref == got).all(), f"mismatch at deg={deg}"


def test_rotate_zero_deg_identity():
    img = np.arange(2 * 5 * 7, dtype=np.float32).reshape(2, 5, 7)
    assert (_rotate_inplane_nearest(img, 0.0) == img).all()


def test_rand_rotate_joint_mask():
    rng = np.random.RandomState(3)
    img = np.random.RandomState(1).rand(4, 16, 16).astype(np.float32)
    mask = (img > 0.5).astype(np.float32)
    out, m = rand_rotate(img, rng, prob=1.0, mask=mask)
    # joint transform: rotated mask must equal thresholding the rotated
    # image wherever the rotated image is nonzero (same index map)
    nz = out != 0
    assert ((out[nz] > 0.5).astype(np.float32) == m[nz]).all()


def test_noise_is_float32_and_deterministic():
    img = np.zeros((2, 8, 8), dtype=np.float32)
    a = rand_gaussian_noise(img, np.random.RandomState(7), prob=1.0, std=0.05)
    b = rand_gaussian_noise(img, np.random.RandomState(7), prob=1.0, std=0.05)
    assert a.dtype == np.float32
    assert (a == b).all()
    assert not (a == 0).all()
    big = rand_gaussian_noise(np.zeros(20000, np.float32).reshape(2, 100, 100),
                              np.random.RandomState(11), prob=1.0, std=0.05)
    assert abs(float(big.std()) - 0.05) < 0.005


def test_flip_unchanged():
    rng = np.random.RandomState(5)
    img = np.random.RandomState(2).rand(3, 6, 6).astype(np.float32)
    out = rand_flip(img.copy(), rng, prob=0.0)
    assert (out == img).all()
