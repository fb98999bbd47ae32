"""Pathology feature-bag handling: instance dropout, padding, bucketing.

Parity targets: ``dataset.py:366-400`` — train-time instance dropout (keep
90% Biopsy / 80% Resection), zero-padding to a fixed max bag length for
batching.  TPU improvement (SURVEY §5): instead of one 15,592-row pad for
every bag, bags are padded to the smallest power-of-2-ish *bucket* and carry
a validity mask — bounded recompilation, ~4-30× less wasted FLOPs, correct
masked softmax downstream.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

DEFAULT_BUCKETS = (512, 1024, 2048, 4096, 8192, 16384)


def instance_dropout(feat: np.ndarray, kind: str,
                     rng: np.random.RandomState) -> np.ndarray:
    """Keep a sorted random 90% (Biopsy) / 80% (Resection) of instances
    (dataset.py:374-381).  Uses the native C++ row gather when built."""
    n = feat.shape[0]
    keep_frac = 0.9 if kind == "Biopsy" else 0.8
    keep = int(n * keep_frac)
    idx = np.sort(rng.choice(n, size=keep, replace=False))
    from . import native
    gathered = native.gather_rows(feat, idx)
    if gathered is not None:
        return gathered
    return feat[idx]


def bucket_for(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    """Smallest bucket ≥ n (last bucket caps)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def pad_bag(feat: np.ndarray, target: int
            ) -> Tuple[np.ndarray, np.ndarray]:
    """Zero-pad (n, d) to (target, d) + bool validity mask; truncates if
    n > target (keeps the first rows, like the reference's fixed buffer,
    dataset.py:383-391).  Uses the native C++ packer when built."""
    n, d = feat.shape
    if n >= target and feat.dtype == np.float32:
        # no-copy fast path (checked BEFORE the native packer, which
        # always fills a fresh buffer): a full bucket needs only a slice
        # view — astype/pack would copy the 46 MB buffer
        return feat[:target], np.ones(target, bool)
    from . import native
    packed = native.pack_bag(feat, target)
    if packed is not None:
        return packed
    if n >= target:
        return (np.asarray(feat[:target], dtype=np.float32),
                np.ones(target, bool))
    out = np.zeros((target, d), dtype=np.float32)
    out[:n] = feat
    mask = np.zeros(target, bool)
    mask[:n] = True
    return out, mask
