"""Typed experiment configuration.

Mirrors the semantics of the reference argparse namespace
(``/root/reference/config.py:10-142``) as a frozen dataclass: every flag the
reference exposes is a field with the same name and default, so launch
commands translate 1:1.  A CLI parser (:func:`create_arg_parser`) builds the
same namespace for the train/test scripts.
"""

from __future__ import annotations

import argparse
import ast
import dataclasses
from dataclasses import dataclass, field
from typing import Any, List, Sequence


def arg_as_list(s: str) -> list:
    """Parse a python-literal list flag (reference ``config.py:4-8``)."""
    v = ast.literal_eval(s)
    if type(v) is not list:
        raise argparse.ArgumentTypeError(f'Argument "{s}" is not a list')
    return v


DEFAULT_CLINICAL_FEATURES = [
    "sex", "age", "sm", "locationcancer", "cancerimaging",
    "cancerimagingT", "cancerimagingN", "cancerimagingM",
    "classification_cancer",
]


@dataclass(frozen=True)
class Config:
    """All experiment knobs.  Field names/defaults match the reference flags
    (``config.py:14-138``); TPU-specific fields are grouped at the bottom."""

    # ---- cohort / folds (config.py:14-19) ----
    hospital_test: List[str] = field(
        default_factory=lambda: ["EUMC", "HUMC", "SCHMC"])
    kfold_num: int = 4
    val_fold: int = 0

    # ---- eval mode (config.py:21-22) ----
    mode: str = "test"
    best_thres: float = 0.5

    # ---- CT geometry (config.py:24-26) ----
    resampleXY: int = 1
    spacing: List[float] = field(default_factory=lambda: [0.6869, 0.6869, 3.0])
    tumorCrop: int = 0

    # ---- data paths (config.py:30-52) ----
    type: str = "Biopsy+Resection"
    test_type: str = "Biopsy+Resection"
    path_data_CT: str = "data/CT"
    path_feature_CT: str = "data/CT/SwinUNETR_feature"
    path_data_pathology: str = "data/Pathology_feature"
    path_data_excel: str = "data/Clinical_excel"
    path_data_mask: str = "data/CT/TumorMask"
    clinical_features: List[str] = field(
        default_factory=lambda: list(DEFAULT_CLINICAL_FEATURES))
    pathology_info_version: str = "v1"

    # ---- image-only WSI patch pipeline (BASELINE config #2; beyond the
    # reference, which only consumes precomputed CTransPath features,
    # dataset.py:367, and loads-but-never-runs the CLIP vision tower) ----
    # 'features' = precomputed bags from path_data_pathology (reference
    # behavior); 'wsi' = tile raw slide images under path_data_wsi, encode
    # with the CLIP ViT patch encoder (data/wsi.py), cache the bags.
    pathology_source: str = "features"
    path_data_wsi: str = "data/WSI"
    wsi_tile: int = 224            # tile size on the slide (px)
    wsi_stride: int = 0            # 0 → non-overlapping (= wsi_tile)
    wsi_px: int = 224              # encoder input resolution
    wsi_encode_batch: int = 256    # tiles per device batch (fixed shape)
    wsi_min_foreground: float = 0.0  # drop tiles below this tissue frac
    wsi_cache_dir: str = ""        # encoded-bag cache ("" = no cache)
    # torch CLIP checkpoint for the patch encoder's vision weights; ""
    # falls back to seeded random ViT weights (synthetic pipelines only,
    # loud warning) with the wsi_vit_* sizes below (ViT-B/32 defaults)
    patch_encoder_ckpt: str = ""
    wsi_patch: int = 32
    wsi_vit_width: int = 768
    wsi_vit_layers: int = 12
    wsi_embed_dim: int = 512

    # ---- modality / model selection (config.py:54-61) ----
    modality: List[str] = field(default_factory=lambda: ["CT", "pathology"])
    alignment_base: str = "none"       # CT | pathology | CI | none
    model_CT: str = "resnetMC3_18"     # resnetMC3_18 | medicalNet | SwinUNETR | MViT | resnet2plus1d_18
    model_pathology: str = "TransMIL"  # ABMIL | ABMIL_v2 | TransMIL
    CI_input_version: str = "v1"       # v1 | v2 | text
    CI_prompt_version: str = "single"  # single | devided
    model_CI: str = "simpleFCs_v1"     # simpleFCs_v{1,1d,2,2d} | CLIP
    aggregator: str = "TransMIL"       # ABMIL | ABMIL_v2 | TransMIL | TransMIL_seperate | TransMIL_per_modality | -
    model_family: str = "aggregator"   # aggregator | clip (late fusion) | concat (early baseline)
    # Dispatch for 'wMask' in model_CT (reference model/utils.py:7-9 routes
    # these to aggregator_wMask): 'concat' = the reference's concat-fusion
    # architecture (aggregator_wMask.py:66-114, single sigmoid head over a
    # 2-layer fc); 'twoway' = this framework's mask-channel flagship
    # (the TwoWay fusion model fed the mask as an extra input channel).
    wmask_family: str = "concat"
    # aggregator_tmp variant (aggregator_tmp.py:120-126): separate clinical
    # encoders + per-modality TwoWayTransformers instead of the shared ones
    separate_CI_encoders: int = 0
    # SwinUNETR crop-MIL overrides (0/[] → reference defaults: 100 crops of
    # 96³, or 3 mask-centred crops for the wMask variant)
    swin_n_subsample: int = 0
    swin_crop: List[int] = field(default_factory=list)
    # encode Swin crops this many at a time (nn.scan loop; peak activation
    # memory = one chunk) — 0 batches all crops at once, which OOMs a
    # 16 GB chip at the reference's 100x96^3 load (BENCH_NOTES r3).
    # -1 = auto (resolve_memory_config): 10 when TRAINING a SwinUNETR
    # trunk (the 100-crop grad OOMs at 25 — zoo6 table), 25 otherwise.
    swin_crop_chunk: int = -1
    # MViT chunk encoder: 'v2_s' = MViT-v2-S multiscale architecture (the
    # reference's torchvision mvit_v2_s, mvit_v2.py:15); 'compact' = small
    # plain ViT.  mvit_depths=[] → the v2_s stage depths (1,2,11,2).
    mvit_arch: str = "v2_s"
    mvit_depths: List[int] = field(default_factory=list)

    # ---- prompts (config.py:63-67) ----
    learnablePrompt: int = 1
    n_ctx: int = 8
    n_prompts: int = 2
    prompt_len: int = 0

    # ---- misc data (config.py:69-73) ----
    data_integration: int = 0
    augmentation: int = 1
    cancerstageTrain: str = "1234"
    cancerstageTest: str = "1234"

    # ---- pretrain / model shape (config.py:75-79) ----
    pretrain: bool = True
    pretrained_weights: str = "DEFAULT"
    dim: str = "3d"
    num_classes: int = 2
    activationF: str = "sigmoid"

    # ---- training (config.py:81-101,118-125) ----
    start_epoch: int = 0
    n_epochs: int = 1000
    resume: str = ""
    pretrainedExt_CT: int = 0
    pretrainedExt_CT_pth: str = ""
    pretrainedExt_pathology: int = 0
    pretrainedExt_pathology_pth: str = ""
    pretrainedExt_CI: int = 0
    pretrainedExt_CI_pth: str = ""
    pretrainedExt_freeze: int = 1
    weight_decay: float = 5e-4
    lr: float = 1e-5
    loss: str = "BCE"                 # BCE | CS | BCE+CS | BCE+CLIP
    loss_point: str = "CT-Pth-Last"   # CT-Pth-Last | Last
    schedule: List[int] = field(default_factory=lambda: [500])
    b1: float = 0.9
    b2: float = 0.999
    seed: int = 1234
    iter_per_epoch: int = 100
    val_iter_per_epoch: int = 50
    batch_size: int = 8
    num_workers: int = 4
    # loader worker pool (data/pipeline.py): 'thread' (default — the hot
    # decode/pack stages release the GIL) or 'process' (spawn workers +
    # shared-memory array transport; scales the GIL-holding pure-python
    # DICOM/NRRD parse and BPE stages across cores).  Batches are
    # identical either way (tests/test_pool_loader.py).
    loader_pool: str = "thread"
    save_best: bool = False
    cos: bool = False

    # ---- labels (config.py:127-133) ----
    survival_type: str = "OS"
    year: int = 5
    label: str = "5yOS"

    # ---- eval / analysis (config.py:135-138) ----
    test_pth: str | None = None
    watch_ID: str = "A000000"
    map_type: str = "saliencyMap"

    # ---- CLIP text tower size (ViT-B/32 text defaults; shrinkable for
    # tests / dry runs) ----
    clip_vocab: int = 49408
    # path to CLIP's bpe_simple_vocab_16e6.txt.gz (external asset, same one
    # the reference downloads); empty → byte-level fallback tokenizer
    bpe_vocab_path: str = ""
    clip_context: int = 77
    clip_width: int = 512
    clip_heads: int = 8
    clip_layers: int = 12
    clip_embed: int = 512

    # ---- TPU-native additions (no reference counterpart) ----
    mesh_shape: List[int] = field(default_factory=lambda: [-1])
    mesh_axes: List[str] = field(default_factory=lambda: ["data"])
    compute_dtype: str = "bfloat16"    # dtype of matmul/conv compute path
    param_dtype: str = "float32"
    bag_buckets: List[int] = field(
        default_factory=lambda: [512, 1024, 2048, 4096, 8192, 16384])
    # Fused Pallas MIL-pooling kernel (ops/pallas/mil_pool.py).  Measured
    # ruling (BENCH_NOTES r2): the v4 kernel beats XLA on the isolated op
    # (1.26 vs 2.05 ms at 8×16384×768 bf16, same harness) but loses at the
    # model level (flagship 2827 vs 2666 bags/s at 8k bags; 1264 vs 1182 at
    # 16k) because the flagship pools small 512-d fused streams where XLA's
    # producer fusion wins.  'auto' (default) applies that ruling: kernel ON
    # for raw 768-d bag pooling on TPU (clip/concat/wMask baselines), OFF
    # for the flagship's fused streams; True/False force either path.
    use_pallas: Any = "auto"
    # Instance (sequence) parallelism for raw-bag gated-attention pooling:
    # name of the mesh axis sharding the bag's instance dim.  Empty = off.
    # Use with parallel/sp_mil.py::instance_sharded_apply; the ABMIL softmax
    # then runs the cross-shard two-pass (pmax/psum over ICI) — exact vs
    # single-device.  Applies to the clip/concat/wMask baseline families
    # (the flagship pools fused streams, not the raw bag).
    bag_shard_axis: str = ""
    # FSDP / ZeRO-3 parameter + optimizer-state sharding (beyond reference:
    # DDP replicates the full model and Adam moments on every GPU,
    # train_ddp.py:79): name of the mesh axis over which the train state's
    # large leaves are sharded (parallel/fsdp.py — largest divisible dim,
    # leaves < 1024 elements stay replicated).  XLA inserts the
    # all-gather/reduce-scatter collectives; numerics match plain DP to
    # float tolerance (tests/test_fsdp.py).  Empty = off (replicated DP).
    fsdp_axis: str = ""
    # Tensor (model) parallelism (beyond reference): name of the mesh axis
    # over which the transformer weight matrices shard in the Megatron
    # column/row-parallel pattern (parallel/tp.py — attention qkv + MLP
    # fc1 output dims, out-proj + MLP fc2 input dims; everything else
    # replicated).  Expressed as GSPMD sharding annotations on the state
    # pytree; XLA propagates layouts and inserts the per-pair all-reduce.
    # Numerics match plain DP to float tolerance (tests/test_tp.py).
    # Composes with fsdp_axis (ZeRO on the non-TP dims).  Empty = off.
    tp_axis: str = ""
    # Pipeline (inter-layer) parallelism (beyond reference): name of the
    # mesh axis over which the CLIP text tower's resblock stack splits into
    # contiguous stages, driven GPipe-style (parallel/pp.py — microbatched
    # lax.scan, one ppermute hop per tick; backward is the autodiff
    # transpose).  clip_layers must divide by the axis size; batch rows
    # must divide by data-shards × pp_micro.  Exact vs the sequential
    # stack (tests/test_pp.py).  Empty = off.
    pp_axis: str = ""
    # GPipe microbatches per pipeline step (bubble fraction
    # (S-1)/(M+S-1)); only used when pp_axis is set.
    pp_micro: int = 2
    # Depth (context) parallelism for the CT trunk DURING TRAINING: name of
    # the mesh axis sharding the volume's depth dim (must appear in
    # mesh_axes, e.g. mesh_shape=[-1, 2], mesh_axes=['data','depth']).
    # Empty = off.  The train step then runs the MC3 trunk inside a
    # shard_map with halo-exchange depth convs (parallel/sp_ct.py's
    # schedule) and BN stats synced over (data, depth) — params, metrics
    # and BN stats match the DP-only step exactly (tests/test_sp_ct.py).
    # The reference trains its CT trunk unsharded under DDP
    # (train_ddp.py:79); this makes the beyond-reference sharding usable
    # where that DDP actually runs.  MC3-family trunks only.
    ct_shard_axis: str = ""
    # Per-compile XLA option overrides for the jitted train/eval steps
    # ("key=value" entries, passed as jax.jit(compiler_options=...) —
    # they serialize through PJRT CompileOptions, so unlike client-side
    # XLA_FLAGS they reach the REMOTE compiler on tunneled backends;
    # utils/cache.py::compiler_options_from_cfg).  xla_tpu_* keys are
    # dropped automatically on non-TPU backends (CPU tests/dryrun).
    # Default: the measured flagship winner from the scoped-VMEM sweep
    # (BENCH_NOTES r3, scripts/bench_xla_flags.py: 274.5 -> 260.2
    # ms/step at 32 MiB; the 16 MiB default, 24/48/64/128 MiB and the
    # latency-hiding scheduler were all neutral-to-worse).
    xla_options: List[str] = field(
        default_factory=lambda: ["xla_tpu_scoped_vmem_limit_kib=32768"])
    # Mixture-of-Experts FFN in the TransMIL aggregator blocks (beyond
    # reference: the reference TransLayer is attention-only,
    # model/dim1/TransMIL.py:8-28).  moe_experts=0 (default) is OFF —
    # reference param tree and numerics untouched.  >0 adds a pre-norm
    # routed FFN (GShard grouped dispatch, top-k routing with capacity,
    # Switch load-balance aux loss weighted by moe_aux_weight) to each
    # TransLayer when aggregator == 'TransMIL' (models/moe.py).
    moe_experts: int = 0
    moe_hidden: int = 1024
    moe_k: int = 2
    moe_capacity: float = 1.25
    moe_group: int = 512
    moe_aux_weight: float = 0.01
    # Expert parallelism: name of the mesh axis sharding the expert-major
    # MoE params (dim 0) — parallel/ep.py's path-keyed GSPMD annotations;
    # XLA propagates the layout through the dispatch/expert/combine
    # einsums and places the all-to-alls on ICI.  Matches the replicated
    # step to float tolerance (tests/test_moe.py).  Empty = off.
    ep_axis: str = ""
    # CT-trunk rematerialisation: 'auto' | 'all' | 'early' (stages 1-2) |
    # 'layer2' (stage 2 only) | 'none'.  Measured at full size on v5e with
    # the dfold temporal lowering (BENCH_NOTES r2): train step 384 ms
    # 'early' / 346 ms 'layer2' / 337 ms 'none' at batch 1 — but batch≥2
    # COMPILE-OOMS at 'layer2' and needs 'early' (zoo6 batch table,
    # BENCH_NOTES r3).  'auto' (default) applies that table per run:
    # training at batch≥2 → 'early' (loud log), else 'layer2'
    # (resolve_memory_config); explicit values are always honored.
    ct_remat: str = "auto"
    # Temporal (kD>1) conv lowering in the CT trunk: 'conv3d' keeps XLA's
    # native 3-D convolution; 'dfold' / 'dsum' / 'dshift' compute the identical op as
    # depth-folded 2-D convs (models/ct_mc3.py::DepthFoldedConv) to ride
    # TPU's better-tuned 2-D conv gradient paths.  Measured at production
    # size on v5e (BENCH_NOTES r2): CT-trunk grad 1075 ms (8.0% MFU) conv3d
    # → 310 ms (26.8% MFU) dfold; fwd 133 → 103 ms.  Parameters and
    # numerics are identical across modes (tests/test_depthfold.py), so
    # checkpoints are mode-agnostic.  Default 'dfold'.
    ct_temporal_mode: str = "dfold"
    # 2-D conv backend for the depth-folded trunk convs: 'xla' | 'pallas'.
    # 'pallas' routes the 3×3 stride-1 folded convs (MC3 layer1 — the
    # cout-64 shape XLA runs at ~21% MFU, BENCH_NOTES r2) through the
    # ops/pallas/conv3x3 MXU kernels (fwd + custom VJP).  Measured ruling
    # in BENCH_NOTES r3.
    ct_conv_backend: str = "xla"
    # Forward lowering for the depth-folded temporal convs.  'conv3d'
    # emits the FORWARD as a native 3-D conv while both gradients stay on
    # the dfold 2-D emitters via custom_vjp.  Measured ruling (BENCH_NOTES
    # r3, scripts/bench_dpack3d.py + bench_train --eval A/B): the 3-D fwd
    # emitter wins in ISOLATION (12.0 vs 16.4 ms/conv — the fold concat
    # costs ~5 ms from cold HBM) but LOSES in-model (eval 83 vs 72 ms)
    # because XLA fuses the fold into the preceding BN/relu producers,
    # making it nearly free in context.  'fold' stays the default; the
    # hybrid stays in-tree, parity-tested, as the recorded negative
    # result.
    ct_fwd_lowering: str = "fold"
    # Blocks per MC3 stage (debug/dryrun knob): [] = the torchvision
    # mc3_18 layout (2,2,2,2).  A reduced layout (e.g. [1,1,1,1]) keeps
    # every stage/sharding/lowering type while halving the compiled graph
    # — used by __graft_entry__'s multi-chip dry run to stay inside the
    # driver's time budget on a 1-core host.  Weight-port parity requires
    # the default.
    ct_layers: List[int] = field(default_factory=list)
    # TwoWayTransformer block depth (debug/dryrun knob like ct_layers):
    # 0 = the reference's depth 2 (aggregator.py:36-42, parity default).
    twoway_depth: int = 0
    # Moore-Penrose pinv iterations in the TransMIL Nyström blocks
    # (debug/dryrun knob like ct_layers): 6 = the reference default
    # (TransMIL.py:19, parity requires it); fewer iterations shrink the
    # unrolled compiled graph for the multi-chip dry run.
    nystrom_pinv_iters: int = 6
    ct_shape: List[int] = field(default_factory=lambda: [160, 512, 512])
    # Decoded-CT cache (beyond reference): "" = off; a directory path
    # stores each patient's packed volume (post gzip-decode + HU-normalise
    # + crop/pad, PRE-augmentation) as raw .npy, written atomically on
    # first miss.  Later epochs do one buffered read (47 ms) instead of
    # re-paying the ~1.2 s/volume decode+pack (BENCH_NOTES r3 table).
    ct_cache_dir: str = ""
    save_dir: str = "results"
    log_every: int = 10
    # Device-transfer prefetch depth (parallel/prefetch.py): a background
    # thread issues device_put N batches ahead so h2d copies overlap the
    # jitted step (the reference's pin_memory + .cuda(non_blocking=True),
    # train_ddp.py:276-293).  0 disables.
    device_prefetch: int = 2
    # Data echoing (beyond reference; Choi et al. 2019, arXiv:1907.05550):
    # apply each loaded batch N times per optimizer epoch pass.  The
    # measured host pipeline costs 749-1617 ms/sample vs a 276 ms train
    # step (BENCH_NOTES r3) — when too few loader cores are available the
    # chip idles between batches, and echoing trades sample diversity for
    # utilization.  Echoes reuse the augmented batch but draw fresh
    # dropout noise (the step's rng folds in the step counter).  1 = off.
    data_echo: int = 1
    # Gradient accumulation (beyond reference): average gradients over N
    # micro-batches before each optimizer update — an N× effective batch
    # without N× activation memory (the accumulator costs one extra
    # params-sized buffer).  The LR schedule counts optimizer updates, so
    # horizons stay correct; checkpoints capture the accumulator, so
    # mid-epoch resume stays exact.  1 = off.
    grad_accum: int = 1
    # jax.profiler trace of the first training epoch written here (view in
    # TensorBoard / Perfetto; the reference's only tracing is wall-clock
    # AverageMeters, SURVEY §5).  Empty = off.
    profile_dir: str = ""
    # Async checkpointing (beyond reference: torch.save blocks the epoch
    # loop, utils.py:192-195): snapshot the state on device, then fetch +
    # serialize + write in a background thread (train/checkpoint.py::
    # AsyncCheckpointer) — hides the multi-second d2h fetch of a
    # production-size state behind the next epoch.  0 = synchronous.
    async_checkpoint: int = 0
    # Checkpoint-on-SIGTERM (train/preempt.py, beyond reference): the epoch
    # loop drains at the next step boundary and writes checkpoint_last so
    # --resume continues the run after a pod preemption.
    handle_preemption: bool = True

    # ------------------------------------------------------------------
    @property
    def n_clinical(self) -> int:
        return len(self.clinical_features)

    @property
    def bag_max(self) -> int:
        """Fixed max bag length for batch>1 (reference dataset.py:383-391)."""
        return 14880 if self.path_data_pathology.endswith("_sn") else 15592

    # 0 → in-plane size keyed on spacing like the reference; >0 overrides
    # (synthetic/debug runs with small volumes)
    ct_hw_override: int = 0

    @property
    def ct_hw(self) -> int:
        """CT in-plane size as a function of spacing (dataset.py:301-308)."""
        if self.ct_hw_override:
            return self.ct_hw_override
        return 224 if self.spacing[0] == 2.0 else 512

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


def resolve_memory_config(cfg: Config, training: bool) -> Config:
    """Resolve the 'auto' memory knobs from the measured zoo6 table
    (BENCH_NOTES r3): the reference trains any batch without per-config
    surgery (train_ddp.py:75-76); here the settings that fit 16 GB are
    batch/model-dependent, so the drivers pick the working ones and say
    so loudly.  Explicit (non-auto) values pass through untouched."""
    kw = {}
    if cfg.ct_remat == "auto":
        remat = "early" if (training and cfg.batch_size >= 2) else "layer2"
        kw["ct_remat"] = remat
        if remat == "early":
            print(f"[memory] ct_remat=auto -> 'early' (batch_size="
                  f"{cfg.batch_size} >= 2 compile-OOMs at 'layer2' on a "
                  f"16 GB chip — zoo6 table, BENCH_NOTES r3)", flush=True)
    if cfg.swin_crop_chunk < 0:
        swin = "SwinUNETR" in cfg.model_CT
        chunk = 10 if (training and swin) else 25
        kw["swin_crop_chunk"] = chunk
        if training and swin:
            print("[memory] swin_crop_chunk=auto -> 10 (training the "
                  "100-crop SwinUNETR trunk OOMs at 25 — zoo6 table, "
                  "BENCH_NOTES r3)", flush=True)
    return cfg.replace(**kw) if kw else cfg


def create_arg_parser() -> argparse.ArgumentParser:
    """CLI mirroring the reference flag surface (``config.py:10-142``)."""
    p = argparse.ArgumentParser()
    for f in dataclasses.fields(Config):
        name = "--" + f.name
        default = (f.default_factory() if f.default_factory
                   is not dataclasses.MISSING else f.default)
        if isinstance(default, list):
            p.add_argument(name, default=default, type=arg_as_list)
        elif isinstance(default, bool):
            p.add_argument(name, default=default,
                           action="store_true" if not default else
                           argparse.BooleanOptionalAction)
        elif default is None:
            p.add_argument(name, default=None, type=str)
        else:
            p.add_argument(name, default=default, type=type(default))
    return p


def parse_config(argv: Sequence[str] | None = None) -> Config:
    ns = create_arg_parser().parse_args(argv)
    return Config(**vars(ns))
