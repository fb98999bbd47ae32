"""Sequence-parallel (instance-sharded) gated-attention MIL pooling.

The reference handles ≤15,592-instance bags on one device (SURVEY §5); when
a bag outgrows a single chip's HBM (whole-slide bags can reach millions of
patches), the TPU-native answer is to shard the INSTANCE axis across the
mesh and compute the attention softmax with cross-chip collectives — the
flash-attention two-pass trick over ICI:

    local logits  a_k            (each chip: its instance shard)
    global max    m  = psum-max(a_k)            ─┐ one ppermute-free
    global denom  s  = psum(Σ exp(a_k − m))      ─┘ all-reduce pair
    pooled        M  = psum(Σ exp(a_k − m)·x_k) / s

Exact (not approximate): identical to single-device masked softmax pooling
up to float reduction order.  Expressed with shard_map + psum so XLA routes
the reductions over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.mil import gated_attention_logits

NEG_INF = -1e30


def _local_pool(x, mask, wv, bv, wu, bu, ww, bw, axis: str):
    """Per-shard body; x: (B, N_local, L), mask: (B, N_local)."""
    x = jnp.where(mask[..., None], x, 0.0)
    a = gated_attention_logits(x, wv, bv, wu, bu, ww, bw)[..., 0]  # (B, Nl)
    a = jnp.where(mask, a, NEG_INF)
    m_local = jnp.max(a, axis=1)                         # (B,)
    # softmax is shift-invariant, so the max needs no gradient (pmax has no
    # transpose rule anyway)
    m = jax.lax.pmax(jax.lax.stop_gradient(m_local), axis)
    e = jnp.where(mask, jnp.exp(a - m[:, None]), 0.0)    # (B, Nl)
    s = jax.lax.psum(jnp.sum(e, axis=1), axis)           # global denom
    num = jax.lax.psum(jnp.einsum("bn,bnl->bl", e, x), axis)
    return num / jnp.maximum(s, 1e-30)[:, None]          # (B, L)


def sharded_mil_pool(x, mask, wv, bv, wu, bu, ww, bw, mesh: Mesh,
                     axis: str = "data"):
    """Pool bags whose instance axis is sharded over ``axis``.

    x: (B, N, L) with N divisible by mesh.shape[axis]; returns (B, L),
    bit-equivalent (up to reduction order) to the single-device pool.
    """
    pooled = jax.shard_map(
        functools.partial(_local_pool, axis=axis),
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis),
                  P(), P(), P(), P(), P(), P()),
        out_specs=P(),
    )(x, mask, wv, bv, wu, bu, ww, bw)
    return pooled


def shard_bag(x, mask, mesh: Mesh, axis: str = "data"):
    """Place a bag with its instance axis sharded across the mesh."""
    xs = jax.device_put(x, NamedSharding(mesh, P(None, axis, None)))
    ms = jax.device_put(mask, NamedSharding(mesh, P(None, axis)))
    return xs, ms


def instance_sharded_apply(model, mesh: Mesh, axis: str = "inst"):
    """Run a raw-bag baseline model with the bag's INSTANCE axis sharded.

    ``model`` must be built with ``Config.bag_shard_axis == axis`` (its
    ABMIL pooling then uses the cross-shard two-pass softmax above).
    Returns ``apply(variables, batch, train=False, rngs=None)`` where
    ``batch['input_pathology']`` / ``'mask_pathology']`` carry the GLOBAL
    instance axis (divisible by the axis size); every other batch entry
    and all outputs are replicated.  Exact vs the unsharded model
    (tests/test_sp_mil.py).
    """
    n = mesh.shape[axis]

    def apply(variables, batch, train: bool = False, rngs=None):
        nb = batch["input_pathology"].shape[1]
        if nb % n:
            raise ValueError(f"bag instance axis {nb} not divisible by "
                             f"mesh axis '{axis}' size {n}")
        specs = {k: (P(None, axis) if k in ("input_pathology",
                                            "mask_pathology") else P())
                 for k in batch}

        def body(v, b):
            return model.apply(v, b, train=train, rngs=rngs)

        return jax.shard_map(body, mesh=mesh, in_specs=(P(), specs),
                             out_specs=P())(variables, batch)

    return apply
