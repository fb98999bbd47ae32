"""Expert parallelism: shard the MoE expert params over a mesh axis.

Beyond the reference (its DDP replicates every weight — train_ddp.py:79),
and beyond-dense even here: the MoE FFN itself is flag-gated extra
capacity (``models/moe.py``, off by default).  With ``Config.ep_axis``
set, the expert-major parameters (E, ...) shard their EXPERT dim over the
named axis — expressed exactly like tensor parallelism (``parallel/tp.py``):
path-keyed GSPMD sharding annotations on the state pytree, XLA's SPMD
partitioner propagating the layout through the dispatch → expert-FFN →
combine einsums and placing the all-to-alls on ICI.  Each device then
holds and computes E/n experts; the one-hot dispatch keeps every shard's
work MXU-shaped.

Numerics match the replicated step to float tolerance — annotations move
tiles, not math (tests/test_moe.py).  Composes with ``fsdp_axis`` the
same way TP does (ZeRO sharding on the non-expert dims of the remaining
leaves), and with TP itself over the SAME mesh axis (the classic TPU
layout: experts ride the model axis) — the path-rule sets are disjoint,
so ``shard_state_tp(rules=DEFAULT_TP_RULES + EP_RULES)`` annotates both
in one pass (train/loop.py wires this; EP on a *different* axis than TP
would need a multi-axis rule pass and is rejected loudly).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

from jax.sharding import Mesh

from .tp import shard_state_tp, tp_shardings

# expert-major MoE leaves: dim 0 is the expert dim.  The router
# (.../moe/router/kernel) deliberately does NOT match — it is a tiny
# per-token Dense that stays replicated.
EP_RULES: Tuple[Tuple[str, int], ...] = (
    (r"/moe/(w1|w2|b1|b2)$", 0),
)


def ep_shardings(tree: Any, mesh: Mesh, axis: str = "expert",
                 fsdp_axis: Optional[str] = None) -> Any:
    """NamedSharding pytree: expert dims over ``axis``, rest replicated
    (or FSDP-sharded when ``fsdp_axis`` is given)."""
    return tp_shardings(tree, mesh, axis, EP_RULES, fsdp_axis)


def shard_state_ep(state: Any, mesh: Mesh, axis: str = "expert",
                   fsdp_axis: Optional[str] = None) -> tuple[Any, Any]:
    """Place a train state with EP (+ optional FSDP) shardings; returns
    ``(sharded_state, shardings)`` for ``make_train_step``."""
    return shard_state_tp(state, mesh, axis, EP_RULES, fsdp_axis)
