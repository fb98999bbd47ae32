"""Tensor (model) parallelism via GSPMD sharding annotations.

Beyond the reference: its DDP (``train_ddp.py:79``) keeps every weight
matrix whole on each GPU, so a single layer can never exceed one device's
memory and per-layer FLOPs never spread across chips.  Here the transformer
weight matrices are sharded over a named 'model' mesh axis in the
Megatron-LM pattern — expressed the idiomatic TPU way: *sharding
annotations on the parameter pytree*, with XLA's SPMD partitioner
propagating layouts through the computation and inserting the collectives
(the scaling-book recipe: pick a mesh, annotate, let XLA place the
all-reduces on ICI).  No wrapper modules, no manual collectives.

Rules (classic Megatron pairing, applied per weight by parameter path):

- **column-parallel** — attention q/k/v projections (fused ``in_proj`` /
  ``to_qkv`` or separate ``q_proj``/``k_proj``/``v_proj``) and the first
  MLP matmul (``c_fc``/``lin1``): the OUTPUT feature dim shards, so each
  device computes its own slice of heads / hidden units.  Their biases
  shard the same way.
- **row-parallel** — the attention output projection (``out_proj`` /
  ``to_out``) and the second MLP matmul (``c_proj``/``lin2``): the INPUT
  feature dim shards, consuming the column-parallel slice locally; XLA
  inserts one all-reduce per pair to rebuild the residual-stream
  activation.  Row-parallel biases stay replicated (they add after the
  reduce).

Everything else (LayerNorms, embeddings, conv trunks, small heads) stays
replicated — the CT trunk has its own context parallelism
(``parallel/sp_ct.py``) and the flagship's non-transformer params are tiny.
A matched rule whose dim the axis can't divide falls back to replicated
(never an error): tiny test models with 4 heads on a 2-way axis still
shard, 1-unit probes don't.

Numerics are exactly data parallelism's — sharding annotations change only
WHERE each tile is computed, and the row-parallel all-reduce sums the same
partial products a local matmul would — so TP state after a train step
matches DP state to float tolerance (pinned in tests/test_tp.py).

Composes with FSDP (``parallel/fsdp.py``): pass ``fsdp_axis`` and each
leaf's remaining (non-TP) largest divisible dim additionally shards over
the FSDP axis — TP splits the matmul, FSDP splits the storage of what's
left, the 2-D analogue of Megatron + ZeRO.

Opt-state moments (Adam mu/nu) carry the same parameter-path suffix inside
the train-state pytree, so one path-regex pass shards params and moments
consistently — a requirement for ``jax.jit`` donation to reuse buffers.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Params kept out of FSDP sharding: they are used INLINE (raw `@` / `+`
# in encode_embedding, not through a Dense), so a storage-sharded layout
# propagates straight into the residual-stream activations and GSPMD
# resolves the collision with an involuntary full remat (MULTICHIP_r04
# tail: the ln_final / take_along_axis sites).  Both are KBs at
# production size — replication costs nothing.
FSDP_EXCLUDE: Tuple[str, ...] = (
    r"text_projection$",
    r"positional_embedding$",
)

# (path regex, dim to shard): -1 = last (column-parallel kernels),
# 0 = first (row-parallel kernels; column-parallel biases).
DEFAULT_TP_RULES: Tuple[Tuple[str, int], ...] = (
    # column-parallel: fused/split qkv + first MLP matmul — output dim
    (r"(in_proj|to_qkv|c_fc|q_proj|k_proj|v_proj|lin1)/kernel$", -1),
    (r"(in_proj|c_fc|q_proj|k_proj|v_proj|lin1)/bias$", 0),
    # row-parallel: attention out-proj + second MLP matmul — input dim
    (r"(out_proj|to_out|c_proj|lin2)/kernel$", 0),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def tp_spec(pathstr: str, shape, axis_size: int, axis_name: str,
            rules: Sequence[Tuple[str, int]] = DEFAULT_TP_RULES) -> P:
    """PartitionSpec for one leaf: first matching rule shards its dim.

    Non-divisible or out-of-range dims replicate (small test models must
    still run); unmatched paths replicate.
    """
    shape = tuple(shape)
    for pat, dim in rules:
        if re.search(pat, pathstr):
            d = dim if dim >= 0 else len(shape) + dim
            if 0 <= d < len(shape) and shape[d] % axis_size == 0 \
                    and shape[d] >= axis_size:
                spec = [None] * len(shape)
                spec[d] = axis_name
                return P(*spec)
            return P()
    return P()


def tp_shardings(tree: Any, mesh: Mesh, axis: str = "model",
                 rules: Sequence[Tuple[str, int]] = DEFAULT_TP_RULES,
                 fsdp_axis: Optional[str] = None,
                 fsdp_min_size: int = 1024) -> Any:
    """Pytree of NamedShardings for a train state (or params) pytree.

    ``fsdp_axis``: additionally shard each leaf's largest divisible dim not
    already taken by TP over that axis (ZeRO-3 storage sharding on top of
    the TP matmul split).
    """
    if axis not in mesh.axis_names:
        raise ValueError(f"tp axis {axis!r} not in mesh axes "
                         f"{mesh.axis_names}")
    if fsdp_axis is not None and fsdp_axis not in mesh.axis_names:
        raise ValueError(f"fsdp axis {fsdp_axis!r} not in mesh axes "
                         f"{mesh.axis_names}")
    n = mesh.shape[axis]

    def one(path, x):
        shape = np.shape(x)
        pathstr_one = _path_str(path)
        spec = list(tp_spec(pathstr_one, shape, n, axis, rules))
        spec += [None] * (len(shape) - len(spec))
        # depthwise/grouped conv kernels (in_channels-per-group dim == 1,
        # e.g. TransMIL PPEG's (k, k, 1, dim)) stay out of FSDP: their
        # channel dim is the conv's group dim, and GSPMD resolves a
        # group-sharded kernel against batch-sharded activations with an
        # involuntary full rematerialization every step — storage saved
        # is a few KB, the reshard is not worth it (MULTICHIP_r04 tail)
        depthwise = len(shape) >= 3 and shape[-2] == 1
        excluded = depthwise or any(re.search(p, pathstr_one)
                                    for p in FSDP_EXCLUDE)
        if fsdp_axis is not None and not excluded and \
                int(np.prod(shape, dtype=np.int64)) >= fsdp_min_size:
            taken = {i for i, s in enumerate(spec) if s is not None}
            nf = mesh.shape[fsdp_axis]
            for i in sorted(range(len(shape)),
                            key=lambda j: shape[j], reverse=True):
                if i not in taken and shape[i] % nf == 0 \
                        and shape[i] >= nf:
                    spec[i] = fsdp_axis
                    break
        while spec and spec[-1] is None:  # replicated leaves get P()
            spec.pop()
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(one, tree)


# Transformer-block module classes that carry the Megatron-paired matmuls
# (DEFAULT_TP_RULES paths live inside these).  Their residual-stream
# inputs/outputs are where activation layouts must be pinned.
TP_BLOCK_CLASSES = frozenset({
    "ResidualAttentionBlock",       # CLIP text + vision towers
    "TransLayer",                   # TransMIL Nyström blocks
    "TwoWayAttentionBlock",         # SAM-style fusion blocks
    "TwoWayAttentionBlock2",
    # layout anchors beyond the Megatron pairs: LayerNorm outputs pin the
    # residual stream wherever it is touched outside a block (CLIP
    # ln_final feeds the FSDP-sharded text_projection contraction, whose
    # propagation otherwise width-shards the stream over 'data'); PPEG's
    # depthwise convs and the MoE dispatch einsums likewise re-derive
    # activation layouts from param shardings unless anchored
    "LayerNorm",
    "PPEG",
    "MoEFFN",
})

# Module methods beyond __call__ whose array args/outputs are pinned.
TP_PIN_METHODS = frozenset({"__call__", "encode_embedding"})


def tp_activation_interceptor(mesh: Mesh, axis: str = "model"):
    """Flax method interceptor pinning residual-stream activation layouts
    at transformer-block boundaries under tensor parallelism.

    Why: TP here is expressed purely as parameter-sharding annotations
    (``tp_shardings``) and XLA's sharding propagation chooses activation
    layouts.  On the 3-D (data, depth, model) mesh, propagation settled on
    CONFLICTING layouts for the same residual stream — batch-dim-sharded
    in one use, width-sharded over 'model' in another — and the SPMD
    partitioner resolved the flip with an "involuntary full
    rematerialization" (replicate-then-repartition) on every resblock,
    visible in the MULTICHIP_r04 dryrun tail.  The Megatron contract is
    that the residual stream between the row-parallel all-reduce and the
    next column-parallel matmul is NOT feature-sharded; only the
    *internal* head/hidden activations are.  Pinning block inputs and
    outputs to (UNCONSTRAINED, ..., None) — feature dim unsharded, batch
    dims left to propagation — anchors propagation so every use agrees,
    and the constraint applies to the transpose (backward) program too.

    Use: ``with nn.intercept_methods(tp_activation_interceptor(mesh)):
    model.apply(...)`` — wired automatically by ``make_train_step`` when
    ``cfg.tp_axis`` is set.  Numerics are untouched (layout-only).
    """
    U = P.UNCONSTRAINED

    def pin(t):
        if hasattr(t, "ndim") and getattr(t, "ndim", 0) >= 2 \
                and hasattr(t, "dtype"):
            spec = P(*([U] * (t.ndim - 1) + [None]))
            return jax.lax.with_sharding_constraint(
                t, NamedSharding(mesh, spec))
        return t

    def interceptor(next_fun, args, kwargs, context):
        name = type(context.module).__name__
        if (context.method_name == "__call__"
                and (name in TP_BLOCK_CLASSES
                     # the MoE fp32 router Dense: its inputs re-derive a
                     # layout through the grouped reshape and its outputs
                     # feed the e-sharded dispatch einsums — anchor both
                     or getattr(context.module, "name", None) == "router")) \
                or (context.method_name in TP_PIN_METHODS
                    and name == "CLIPTextEncoder"):
            args = tuple(pin(a) for a in args)
            return jax.tree_util.tree_map(pin, next_fun(*args, **kwargs))
        return next_fun(*args, **kwargs)

    return interceptor


def shard_state_tp(state: Any, mesh: Mesh, axis: str = "model",
                   rules: Sequence[Tuple[str, int]] = DEFAULT_TP_RULES,
                   fsdp_axis: Optional[str] = None) -> tuple[Any, Any]:
    """Place a train state with TP (+ optional FSDP) shardings.

    Returns ``(sharded_state, shardings)``; pass the shardings to
    ``make_train_step(state_shardings=...)`` so the jitted step pins input
    AND output state layouts (donation then reuses the sharded buffers),
    exactly like ``fsdp.shard_state``.
    """
    shardings = tp_shardings(state, mesh, axis, rules, fsdp_axis)
    placed = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, shardings)
    return placed, shardings
