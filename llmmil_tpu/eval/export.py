"""Serving export: freeze the model into a portable StableHLO artifact.

Beyond the reference, whose serving path re-instantiates the full torch
module tree and loads a checkpoint in-process (``test_ddp.py:65-105``) —
deployment there requires the model *code* at the exact same version.
Here :func:`export_model` bakes the trained variables into a
multi-platform ``jax.export`` StableHLO function; the resulting artifact
is a single self-contained file that any JAX runtime can execute
**without the model code or checkpoint** — the TPU-native equivalent of a
TorchScript/ONNX deployment artifact.

XLA is a static-shape compiler, so one entry is exported per input
signature (batch size x bag bucket — mirroring the framework's bucketed
bag padding); :class:`ServingModel` dispatches to the entry matching the
incoming batch's shapes.

Format: flax-msgpack container ``{"manifest": json, "entries": {key:
serialized Exported}}``.  The manifest records the config snapshot, the
per-entry signatures, and the jax version.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from jax import export as jax_export

from ..config import Config
from ..models import build_model


def make_example_batch(cfg: Config, batch: int = 1,
                       bag: Optional[int] = None,
                       ct_depth: int = 160) -> Dict[str, jnp.ndarray]:
    """Zero-filled batch with the production shapes the config implies
    (CT crop/pad geometry dataset.py:301-339, bag pad dataset.py:383-391,
    CI encodings dataset.py:402-502)."""
    import math

    out: Dict[str, jnp.ndarray] = {}
    if "CT" in cfg.modality:
        hw = cfg.ct_hw
        out["input_CT"] = jnp.zeros((batch, ct_depth, hw, hw, 1),
                                    jnp.float32)
        if "wMask" in cfg.model_CT:
            out["mask_CT"] = jnp.zeros((batch, ct_depth, hw, hw, 1),
                                       jnp.float32)
    if "pathology" in cfg.modality:
        n = bag or (cfg.bag_buckets[-1] if cfg.bag_buckets else cfg.bag_max)
        out["input_pathology"] = jnp.zeros((batch, n, 768), jnp.float32)
        out["mask_pathology"] = jnp.ones((batch, n), bool)
        if cfg.model_pathology == "ABMIL_v2":
            out["BpRc_class"] = jnp.zeros((batch, 1), jnp.float32)
    if cfg.model_CI == "CLIP":
        n_p = cfg.n_clinical + 1 if cfg.CI_prompt_version == "devided" \
            else 1
        ctx = cfg.clip_context - cfg.prompt_len
        toks = np.zeros((batch, n_p, ctx), np.int32)
        toks[..., 0] = 1
        toks[..., -1] = cfg.clip_vocab - 1        # EOT = argmax id
        out["input_CI"] = jnp.asarray(toks)
    else:
        dim = cfg.n_clinical if cfg.CI_input_version.startswith("v1") \
            else 27
        if cfg.CI_input_version.endswith("d"):     # tiled *d variants
            dim *= 1 + math.floor(512 / dim)
        out["input_CI"] = jnp.zeros((batch, dim), jnp.float32)
    return out


def _entry_key(batch: Dict[str, Any]) -> str:
    sig = sorted((k, tuple(np.shape(v)), str(np.asarray(v).dtype))
                 for k, v in batch.items())
    return ";".join(f"{k}:{'x'.join(map(str, s))}:{d}" for k, s, d in sig)


def export_forward(fn, batches: Iterable[Dict],
                   platforms: Sequence[str] = ("tpu", "cpu"),
                   manifest_extra: Optional[Dict] = None) -> bytes:
    """Serialize an arbitrary ``fn(batch) -> probs`` callable (any arrays
    it closes over — params, quantization packs — bake in as constants)
    for each example batch signature into one artifact blob."""
    entries: Dict[str, bytes] = {}
    sigs: Dict[str, Dict] = {}
    for b in batches:
        specs = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x),
                                           np.asarray(x).dtype), b)
        exp = jax_export.export(jax.jit(fn),
                                platforms=tuple(platforms))(specs)
        key = _entry_key(b)
        entries[key] = exp.serialize()
        sigs[key] = {k: [list(np.shape(v)), str(np.asarray(v).dtype)]
                     for k, v in b.items()}
    manifest = {"jax_version": jax.__version__,
                "platforms": list(platforms),
                "entries": sigs}
    manifest.update(manifest_extra or {})
    return serialization.msgpack_serialize(
        {"manifest": json.dumps(manifest).encode(),
         "entries": entries})


def export_model(cfg: Config, variables: Dict, batches: Iterable[Dict],
                 platforms: Sequence[str] = ("tpu", "cpu")) -> bytes:
    """Serialize ``model.apply(variables, batch, train=False)['probs']``
    for each example batch signature into one artifact blob.

    ``variables`` ({'params': ..., 'batch_stats': ...}) are baked into the
    StableHLO module as constants — the artifact needs no checkpoint.
    ``platforms``: lowerings embedded per platform ('tpu' + 'cpu' by
    default, so the same file serves on TPU and validates on CPU).
    """
    model = build_model(cfg)

    def fn(batch):
        return model.apply(variables, batch, train=False)["probs"]

    return export_forward(fn, batches, platforms,
                          {"num_classes": cfg.num_classes,
                           "config": cfg.to_dict()})


def save_artifact(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


class ServingModel:
    """A loaded artifact: ``call(batch) -> probs``, dispatching on the
    batch's exact shape signature (one compiled entry per signature)."""

    def __init__(self, blob: bytes):
        raw = serialization.msgpack_restore(blob)
        self.manifest = json.loads(bytes(raw["manifest"]).decode())
        self._exported = {k: jax_export.deserialize(bytes(v))
                          for k, v in raw["entries"].items()}

    @property
    def signatures(self):
        return self.manifest["entries"]

    def call(self, batch: Dict[str, Any]):
        key = _entry_key(batch)
        if key not in self._exported:
            have = "\n  ".join(sorted(self._exported))
            raise KeyError(
                f"no exported entry for signature\n  {key}\n"
                f"available:\n  {have}")
        return self._exported[key].call(batch)


def load_artifact(path: str) -> ServingModel:
    with open(path, "rb") as f:
        return ServingModel(f.read())
