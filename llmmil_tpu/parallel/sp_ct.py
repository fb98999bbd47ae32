"""Depth-sharded (spatial-partitioned) CT encoding — context parallelism
for the 3-D CNN trunk.

The reference runs its CT encoder on ONE GPU per sample (SURVEY §2.9 — DP
is the only strategy), so batch-1 inference latency — its timed eval
metric (test_ddp.py:214-234) — cannot use more than one device.  On TPU
the MC3 trunk is depth-shardable almost for free: every stage keeps the
depth axis D=160 unchanged (temporal strides are all 1 in MC3), and only
six convs look across depth at all (the 1→3ch downsampling stem, the
(3,7,7) BasicStem, and layer1's four (3,3,3) convs).  Sharding D over a
mesh axis therefore needs just a 1-slice halo exchange (``ppermute`` over
ICI) before each of those convs — ``models/ct_mc3.py::halo_pad_depth`` —
after which layers 2-4 are embarrassingly parallel.

Numerics are identical to the unsharded trunk: ppermute delivers real
neighbour slices interior-side and zeros at the chain ends (exactly the
conv's zero padding at the physical volume boundary), and BatchNorm
train-mode statistics are synchronised over the depth axis group
(``axis_name`` pmean), so sharded and unsharded agree to float tolerance
in BOTH eval and train modes (tests/test_sp_ct.py).

Scaling: at 8-way sharding each chip convolves a (B, 20, H, W, C) slab —
compute and HBM footprint both ÷8, communication = 6 halo exchanges of
(B, 1, H', W', C) slices over ICI.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def depth_sharded_ct(model, mesh: Mesh, axis: str = "depth"):
    """Wrap a CT encoder so the volume's depth axis is sharded over ``axis``.

    ``model`` must expose a ``shard_axis`` attribute threaded to its depth
    convs/BN (``ResnetMC3_18`` does).  Returns ``apply(variables, x,
    train=False, mutable=False)`` where ``x`` is the GLOBAL (B, D, H, W, C)
    volume with D divisible by ``mesh.shape[axis]``; the result is the
    global (B, D, H', W', C') feature map, sharded over ``axis`` on its
    depth dim.  Params/stats are replicated; differentiable (halo
    exchanges transpose to the reverse ppermute).
    """
    n = mesh.shape[axis]
    sharded = model.clone(shard_axis=axis)

    def apply(variables, x, train: bool = False, mutable=False):
        if x.shape[1] % n:
            raise ValueError(
                f"depth {x.shape[1]} not divisible by mesh axis "
                f"'{axis}' size {n}")

        def body(v, xl):
            return sharded.apply(v, xl, train=train, mutable=mutable)

        out_specs = (P(None, axis), P()) if mutable else P(None, axis)
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(None, axis)),
            out_specs=out_specs,
        )(variables, x)

    return apply


def shard_volume(x, mesh: Mesh, axis: str = "depth"):
    """Place a (B, D, H, W, C) volume with its depth axis sharded."""
    return jax.device_put(x, NamedSharding(mesh, P(None, axis)))


def flagship_ct_features(cfg, variables, x, mesh: Mesh,
                         axis: str = "depth", train: bool = False):
    """Depth-sharded CT feature extraction for the flagship ``Aggregator``.

    Runs the configured CT extractor (``extractor_CT`` subtree of the
    flagship's variables) with the volume's depth axis sharded over
    ``axis``, returning the layer4 feature map the aggregator consumes.
    Feed the result back through the model's precomputed-features path
    (``batch["ct_features"]``, models/aggregator.py) — the downstream
    numerics are identical to the in-model extractor, so batch-1 serving
    latency (the reference's timed metric, test_ddp.py:214-234) scales
    with the mesh while everything else stays unchanged.

    ``train=True`` runs BatchNorm in train mode (batch stats, synced over
    the depth group) and returns ``(features, updated_vars)`` where
    ``updated_vars['batch_stats']`` is the extractor's updated (replicated)
    stats subtree; ``train=False`` returns just the features.
    """
    import jax.numpy as jnp

    from ..models.aggregator import make_ct_extractor

    if not cfg.model_CT.startswith("resnetMC3"):
        raise ValueError(
            f"depth sharding supports the MC3 trunk (its depth axis is "
            f"stride-1 end to end), not model_CT={cfg.model_CT!r}")
    dtype = (jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype
             else jnp.float32)
    ext = make_ct_extractor(cfg, dtype)
    sub = {coll: tree["extractor_CT"] for coll, tree in variables.items()
           if "extractor_CT" in tree}
    return depth_sharded_ct(ext, mesh, axis)(
        sub, shard_volume(x, mesh, axis), train=train,
        mutable=["batch_stats"] if train else False)
