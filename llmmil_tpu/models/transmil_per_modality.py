"""TransMIL variant with per-modality positional encoding.

Parity target: ``model/dim1/TransMIL_per_modality.py:46-120`` — the fused
token stream is split into [n_ci CI, n_ct CT, rest pathology] segments, each
segment is square-wrap-padded independently and gets its OWN PPEG conv grid,
while the two TransLayers are shared across the whole stream.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from .transmil import PPEG, TransLayer


def _square_pad(h, mask):
    n = h.shape[1]
    side = int(math.ceil(math.sqrt(n)))
    add = side * side - n
    if add:
        h = jnp.concatenate([h, h[:, :add]], axis=1)
        if mask is not None:
            mask = jnp.concatenate([mask, mask[:, :add]], axis=1)
    return h, mask, side


class TransMILPerModality(nn.Module):
    """Returns (cls embedding (B, D), [attn0, attn1])."""
    n_classes: int = 2
    L: int = 512
    D: int = 512
    n_ci: int = 10
    n_ct: int = 160
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False,
                 return_attn: bool = False):
        h = nn.relu(nn.Dense(self.D, dtype=self.dtype, name="fc1")(x))
        segs = []
        bounds = [(0, self.n_ci), (self.n_ci, self.n_ci + self.n_ct),
                  (self.n_ci + self.n_ct, h.shape[1])]
        sides = []
        seg_masks = []
        for lo, hi in bounds:
            seg = h[:, lo:hi]
            m = mask[:, lo:hi] if mask is not None else None
            seg, m, side = _square_pad(seg, m)
            segs.append(seg)
            seg_masks.append(m)
            sides.append(side)

        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.D), self.dtype)
        h = jnp.concatenate(
            [jnp.broadcast_to(cls, (x.shape[0], 1, self.D))] + segs, axis=1)
        if mask is not None:
            ones = jnp.ones((x.shape[0], 1), bool)
            mask = jnp.concatenate([ones] + seg_masks, axis=1)

        h, attn0 = TransLayer(self.D, self.dtype, name="layer1")(
            h, mask, train, return_attn)

        # per-modality PPEG on each segment's own grid (shared cls token)
        out = [h[:, :1]]
        offset = 1
        for i, side in enumerate(sides):
            n = side * side
            seg = jnp.concatenate([h[:, :1], h[:, offset:offset + n]],
                                  axis=1)
            m = None
            if mask is not None:
                m = jnp.concatenate([mask[:, :1],
                                     mask[:, offset:offset + n]], axis=1)
            seg = PPEG(self.D, self.dtype, name=f"pos_layer_{i}")(
                seg, side, side, m)
            out.append(seg[:, 1:])
            offset += n
        h = jnp.concatenate(out, axis=1)

        h, attn1 = TransLayer(self.D, self.dtype, name="layer2")(
            h, mask, train, return_attn)
        h = nn.LayerNorm(name="norm")(h)[:, 0]
        return h, [attn0, attn1]
