"""Dataset + host-side batch loader with prefetch.

Parity target: ``ImageDataset`` + torch ``DataLoader`` usage
(``dataset.py:34-187``, ``train_ddp.py:188-196``).  TPU-native differences:

- bags are bucket-padded per *batch* with a validity mask (SURVEY §5) instead
  of one global 15,592-row pad;
- a background thread pipelines host I/O with device compute (the 16-worker
  torch DataLoader equivalent for the single-host case);
- ``SyntheticCohort`` provides a deterministic in-memory cohort so the whole
  train/eval path runs without the (private) hospital data.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np
import pandas as pd

from ..config import Config
from . import augment as aug
from .bags import bucket_for, instance_dropout, pad_bag
from .clinical import clinical_prompts, clinical_vector
from .cohort import build_cohort
from .ct_io import (crop_or_pad_volume, hu_normalize, load_ct_metadata,
                    read_nifti)
from .medical_io import nrrd_mask_to_zyx, read_dicom_tags, read_nrrd
from .tokenizer import tokenize


def reference_dicom_path(cfg: Config, row) -> Optional[str]:
    """The reference's DICOM metadata path formula (dataset.py:258-259):
    string-sliced out of the excel column ``CT_before1``."""
    c = row.get("CT_before1")
    if not isinstance(c, str) or len(c) < 4:
        return None
    return (f"{cfg.path_data_CT}/{row['hospital']}/{row['patientid']}/"
            f"{c[1:-3]}/{c[-2]}/LUNG_{row['hospital']}_{row['patientid']}"
            f"_CT_{c[1]}_{c[-2]}_0003.dcm")


class MultimodalDataset:
    """Per-sample assembly (dataset.py:142-187 + getdata_from_df)."""

    def __init__(self, cfg: Config, mode: str = "train",
                 df: Optional[pd.DataFrame] = None,
                 feature_store: Optional[Dict] = None):
        self.cfg = cfg
        self.mode = mode
        self.df = df if df is not None else build_cohort(cfg, mode)
        self.df = self.df.reset_index(drop=True)
        self.feature_store = feature_store   # {(hospital, kind, pid): array}
        self.ct_store = feature_store or {}
        self._tokenizer = None
        # fixed per-mode offsets: python's salted hash() would make
        # augmentation streams differ between identically-seeded runs.
        # Randomness is drawn from a per-(epoch, index) stream rather than
        # one shared RandomState so samples can be loaded by parallel
        # workers in any order with identical results.
        mode_off = {"train": 0, "valid": 1, "test": 2}.get(mode, 3)
        self.base_seed = cfg.seed + mode_off
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __getstate__(self):
        """Process-pool pickling (BatchLoader(pool='process')): drop the
        lazily-built unpicklable members — the BPE tokenizer and the
        jitted WSI patch encoder rebuild themselves in each worker."""
        d = self.__dict__.copy()
        d["_tokenizer"] = None
        d.pop("_patch_encoder", None)
        return d

    def _sample_rng(self, idx: int) -> np.random.RandomState:
        return np.random.RandomState(
            (self.base_seed * 1_000_003 + self.epoch * 9_973 + idx)
            % (2 ** 31 - 1))

    def __len__(self) -> int:
        return len(self.df)

    # ---- modality loaders -------------------------------------------------
    def _load_ct(self, row, rng):
        cfg = self.cfg
        key = ("CT", row["hospital"], row["patientid"])
        if self.feature_store and key in self.feature_store:
            img = np.asarray(self.feature_store[key], dtype=np.float32)
        else:
            cache = self._ct_cache_path(row)
            if cache and os.path.exists(cache):
                # decoded-CT cache hit: one buffered .npy read (47 ms at
                # production size, BENCH_NOTES r3) replaces the ~1.2 s/
                # volume gzip-decode + HU-normalise + crop/pad; contents
                # are the packed float32 volume.  A plain buffered read,
                # not mmap: every byte is consumed immediately by the
                # augment/astype pass, so mmap would only defer the same
                # I/O behind page faults.
                img = np.load(cache, mmap_mode=None)
            else:
                sx, sy, sz = cfg.spacing
                base = (f"{cfg.path_data_CT}/X({sx})Y({sy})Z({sz})/"
                        f"{row['hospital']}/{row['patientid']}")
                img = read_nifti(base + ".nii.gz")
                dcm = reference_dicom_path(cfg, row)
                if dcm and os.path.exists(dcm):
                    # real hospital layout: per-study DICOM header
                    # (dataset.py:258-260)
                    meta = read_dicom_tags(dcm)
                else:
                    meta = load_ct_metadata(base + ".json")
                from . import native
                fused = native.hu_normalize_crop(img, meta,
                                                 cfg.ct_shape[0], cfg.ct_hw)
                if fused is not None:
                    img = fused
                else:
                    img = crop_or_pad_volume(hu_normalize(img, meta),
                                             cfg.ct_shape[0], cfg.ct_hw)
                if cache:
                    self._ct_cache_write(cache, img)
        if img.shape != (cfg.ct_shape[0], cfg.ct_hw, cfg.ct_hw):
            img = crop_or_pad_volume(img, cfg.ct_shape[0], cfg.ct_hw)

        mask = None
        if cfg.tumorCrop or "wMask" in cfg.model_CT:
            mask = self._load_tumor_mask(row, img.shape)
        if self.mode == "train" and cfg.augmentation:
            if mask is not None:
                img, mask = aug.augment_ct(img, rng, mask=mask)
            else:
                img = aug.augment_ct(img, rng)
        if cfg.tumorCrop and mask is not None:
            from .ct_io import tumor_crop_box
            img = tumor_crop_box(img, mask)
        img = img[..., None].astype(np.float32)          # (D, H, W, 1)
        if "wMask" in cfg.model_CT and mask is not None:
            return img, mask[..., None].astype(np.float32)
        return img, None

    def _ct_cache_path(self, row) -> str:
        """Cache file for one patient's packed volume, keyed on everything
        that determines its contents (spacing path, depth, in-plane size)."""
        cfg = self.cfg
        if not cfg.ct_cache_dir:
            return ""
        sx, sy, sz = cfg.spacing
        return os.path.join(
            cfg.ct_cache_dir, f"X({sx})Y({sy})Z({sz})", row["hospital"],
            f"{row['patientid']}_{cfg.ct_shape[0]}x{cfg.ct_hw}.npy")

    @staticmethod
    def _ct_cache_write(path: str, img: np.ndarray) -> None:
        """Atomic write (tmp + rename) — concurrent loader workers may
        race on the same patient; os.replace keeps readers consistent."""
        tmp = f"{path}.tmp{os.getpid()}_{threading.get_ident()}"
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(tmp, "wb") as f:
                np.save(f, np.ascontiguousarray(img, dtype=np.float32))
            os.replace(tmp, path)
        except OSError:                                  # pragma: no cover
            # cache is best-effort: a full/read-only disk must not kill
            # the epoch
            if os.path.exists(tmp):
                os.remove(tmp)

    def _load_tumor_mask(self, row, shape) -> np.ndarray:
        """Tumour mask: the reference's nrrd layout (``CT_{pid}.nrrd`` plus
        the optional ``prediction_3d_lowres/CT_{pid}.nrrd``, summed and
        binarised — dataset.py:265-270), or .npy/.nii.gz equivalents;
        in-memory store for synthetic runs; zeros if absent."""
        key = ("mask", row["hospital"], row["patientid"])
        if self.feature_store and key in self.feature_store:
            m = np.asarray(self.feature_store[key], dtype=np.float32)
        else:
            base = f"{self.cfg.path_data_mask}/CT_{row['patientid']}"
            if os.path.exists(base + ".nrrd"):
                m, _ = read_nrrd(base + ".nrrd")
                m = m.astype(np.float32)
                low = (f"{self.cfg.path_data_mask}/prediction_3d_lowres/"
                       f"CT_{row['patientid']}.nrrd")
                if os.path.exists(low):
                    ml, _ = read_nrrd(low)
                    if ml.shape == m.shape:
                        m = m + ml.astype(np.float32)
                m = nrrd_mask_to_zyx(m)          # (X,Y,Z) → (Z,Y,X)
            elif os.path.exists(base + ".npy"):
                m = np.load(base + ".npy").astype(np.float32)
            elif os.path.exists(base + ".nii.gz"):
                m = read_nifti(base + ".nii.gz").astype(np.float32)
            else:
                return np.zeros(shape, np.float32)
        return crop_or_pad_volume(np.clip(m, 0, 1), self.cfg.ct_shape[0],
                                  self.cfg.ct_hw)

    def _load_bag(self, row, rng) -> np.ndarray:
        cfg = self.cfg
        kind = row["pathologyimage"]
        key = ("pathology", row["hospital"], row["patientid"])
        if cfg.pathology_source == "wsi":
            feat = self._load_wsi_bag(row, kind)
        elif self.feature_store and key in self.feature_store:
            feat = np.asarray(self.feature_store[key], dtype=np.float32)
        else:
            p = (f"{cfg.path_data_pathology}/{row['hospital']}/"
                 f"{kind}/{row['patientid']}.npy")
            feat = np.load(p).astype(np.float32)
        if self.mode == "train" and cfg.augmentation:
            feat = instance_dropout(feat, kind, rng)
        return feat

    # ---- image-only WSI path (BASELINE config #2; data/wsi.py) ----------
    def _wsi_cache_path(self, row, kind) -> str:
        cfg = self.cfg
        if not cfg.wsi_cache_dir:
            return ""
        stride = cfg.wsi_stride or cfg.wsi_tile
        return os.path.join(
            cfg.wsi_cache_dir, row["hospital"], kind,
            f"{row['patientid']}_t{cfg.wsi_tile}s{stride}"
            f"p{cfg.wsi_px}f{cfg.wsi_min_foreground}.npy")

    def _wsi_encoder(self):
        """Lazy per-dataset patch encoder (jit-compiled once; the lock in
        PatchEncoder serializes device calls across loader threads)."""
        enc = getattr(self, "_patch_encoder", None)
        if enc is None:
            from .wsi import PatchEncoder
            enc = self._patch_encoder = PatchEncoder.from_config(self.cfg)
        return enc

    def _load_wsi_bag(self, row, kind) -> np.ndarray:
        """Tile + CLIP-encode one slide into an (N, embed) bag, with an
        encoded-bag cache keyed on the tiling parameters (the WSI analog
        of the decoded-CT cache).  Production flow: precompute every bag
        with scripts/encode_wsi.py, then train with
        pathology_source='features' on its output."""
        cfg = self.cfg
        cache = self._wsi_cache_path(row, kind)
        if cache and os.path.exists(cache):
            return np.load(cache).astype(np.float32)
        skey = ("wsi", row["hospital"], row["patientid"])
        if self.feature_store and skey in self.feature_store:
            img = np.asarray(self.feature_store[skey])
        else:
            from .wsi import read_slide
            base = (f"{cfg.path_data_wsi}/{row['hospital']}/{kind}/"
                    f"{row['patientid']}")
            for ext in (".npy", ".png", ".jpg", ".jpeg", ".tif", ".tiff"):
                if os.path.exists(base + ext):
                    img = read_slide(base + ext)
                    break
            else:
                raise FileNotFoundError(
                    f"no slide image under {base}.* "
                    f"(pathology_source='wsi')")
        feat, _pos = self._wsi_encoder().encode(
            img, tile=cfg.wsi_tile, stride=cfg.wsi_stride or None,
            min_foreground=cfg.wsi_min_foreground)
        if cache:
            self._ct_cache_write(cache, feat)    # same atomic .npy write
        return feat

    def _load_ci(self, row) -> np.ndarray:
        cfg = self.cfg
        if cfg.CI_input_version in ("v1", "v2"):
            return clinical_vector(
                dict(row), cfg.CI_input_version, cfg.clinical_features,
                duplicated=cfg.model_CI.endswith("d"))
        prompts = clinical_prompts(
            dict(row), cfg.CI_prompt_version,
            learnable_prompt=bool(cfg.learnablePrompt), n_ctx=cfg.n_ctx)
        if self._tokenizer is None:
            from .tokenizer import ClipTokenizer
            self._tokenizer = ClipTokenizer(cfg.bpe_vocab_path or None,
                                            vocab_size=cfg.clip_vocab)
        # byte-level fallback emits ~1 token/char, so the 'single' clinical
        # sentence overflows 77 — truncate (real BPE vocab fits untruncated)
        return tokenize(prompts,
                        context_length=cfg.clip_context - cfg.prompt_len,
                        tokenizer=self._tokenizer,
                        truncate=not self._tokenizer.bpe_ranks)

    def _label(self, row) -> np.ndarray:
        cfg = self.cfg
        if cfg.label == "5yOS":
            y = int(row["label"])
        elif cfg.label == "BpRs":
            y = 0 if row["pathologyimage"] == "Biopsy" else 1
        elif cfg.label == "Tstage":
            y = int(row["label_T"])
        elif cfg.label == "locationcancer":
            y = int(row["locationcancer"]) - 1
        elif cfg.label == "classification_cancer":
            y = int(row.get("classification cancer",
                            row.get("classification_cancer"))) - 1
        else:
            y = int(row["label"])
        return np.eye(cfg.num_classes, dtype=np.float32)[y]

    def __getitem__(self, idx: int) -> Dict:
        cfg = self.cfg
        row = self.df.iloc[idx]
        rng = self._sample_rng(idx)
        sample: Dict = {"ID": row["patientid"], "label": self._label(row)}
        if "CT" in cfg.modality:
            ct, ct_mask = self._load_ct(row, rng)
            sample["input_CT"] = ct
            if ct_mask is not None:
                sample["mask_CT"] = ct_mask
        if "pathology" in cfg.modality:
            sample["input_pathology"] = self._load_bag(row, rng)
            sample["BpRc_class"] = np.array(
                [0.0 if row["pathologyimage"] == "Biopsy" else 1.0],
                dtype=np.float32)
        sample["input_CI"] = self._load_ci(row)
        return sample


class SyntheticCohort:
    """Deterministic synthetic stand-in for the hospital data: a cohort
    table with the reference's schema plus in-memory CT volumes and
    label-correlated CTransPath-like bags."""

    def __init__(self, cfg: Config, n_per_hospital: int = 8,
                 ct_shape=(16, 64, 64), bag_range=(80, 300), seed: int = 0,
                 wsi_shape=None):
        rs = np.random.RandomState(seed)
        rows: List[Dict] = []
        store: Dict = {}
        hospitals = ["AJMC", "CNUH", "PNUH", "EUMC", "HUMC", "SCHMC"]
        pid = 0
        for hosp in hospitals:
            for _ in range(n_per_hospital):
                label = int(rs.randint(0, 2))
                patient = f"S{pid:05d}"
                pid += 1
                kind = "Biopsy" if rs.rand() < 0.5 else "Resection"
                rows.append({
                    "patientid": patient, "hospital": hosp,
                    "pathologyimage": kind, "CT_before1": "(1, x, 1)",
                    "CT ID mismatch": 0,
                    "sex": "M" if rs.rand() < 0.5 else "F",
                    "sm": "N" if rs.rand() < 0.5 else "Y",
                    "age": int(rs.randint(40, 85)),
                    "birth date": "1950-01-01",
                    "locationcancer": int(rs.randint(1, 6)),
                    "cancerimaging": int(rs.randint(1, 5)),
                    "cancerimagingT": int(rs.randint(1, 5)),
                    "cancerimagingN": int(rs.randint(0, 4)),
                    "cancerimagingM": int(rs.randint(0, 2)),
                    "classification cancer": int(rs.randint(1, 3)),
                    "label": label, "label_T": 0, "label_TNM": 0,
                })
                n_inst = int(rs.randint(*bag_range))
                bag = rs.randn(n_inst, 768).astype(np.float32) \
                    + label * 0.3
                store[("pathology", hosp, patient)] = bag
                vol = rs.rand(*ct_shape).astype(np.float32) * 0.2 \
                    + label * 0.1
                store[("CT", hosp, patient)] = vol
                if wsi_shape is not None:
                    # label-tinted uint8 RGB "slide" for the image-only
                    # WSI pipeline (pathology_source='wsi')
                    img = rs.randint(0, 200, tuple(wsi_shape) + (3,))
                    img[..., 0] = np.clip(img[..., 0] + label * 40,
                                          0, 255)
                    store[("wsi", hosp, patient)] = img.astype(np.uint8)
        self.df = pd.DataFrame(rows)
        self.store = store

    def dataset(self, cfg: Config, mode: str) -> MultimodalDataset:
        from .cohort import hospital_split, kfold_split
        df = hospital_split(self.df, cfg.hospital_test, mode)
        df = kfold_split(df, cfg.kfold_num, cfg.val_fold, mode)
        return MultimodalDataset(cfg, mode, df=df,
                                 feature_store=self.store)


# ---------------------------------------------------------------------------
# Process-pool worker plumbing (BatchLoader(pool='process')).
#
# The GIL-holding per-sample stages — the pure-python DICOM/NRRD parsers
# (data/medical_io.py), BPE tokenization, cohort/CI glue — cannot scale
# across cores on threads; a process pool sidesteps the GIL (the torch
# num_workers=16 equivalent, train_ddp.py:75-76 + dataset worker
# processes).  Design:
# - 'spawn' context: the parent typically has a live JAX runtime whose
#   threads make fork() unsafe (deadlock risk); spawn re-imports in the
#   child, and the dataset is pickled ONCE per worker via the pool
#   initializer (a per-task submit would re-pickle the cohort DataFrame
#   and feature store every sample);
# - epoch rides along with each index so the per-(epoch, index) RNG
#   streams stay exact without re-creating the pool per epoch;
# - arrays above _SHM_MIN bytes return through POSIX shared memory
#   (one copy out of the segment) instead of being pickled through the
#   result pipe (serialize + deserialize = two copies of a 168 MB CT
#   view, BENCH_NOTES r3 collate table).
# ---------------------------------------------------------------------------

_POOL_DS = None
_SHM_MIN = 1 << 20


def _pool_init(ds):
    global _POOL_DS
    _POOL_DS = ds


def _shm_pack(sample: Dict) -> Dict:
    from multiprocessing import shared_memory
    out: Dict = {}
    for k, v in sample.items():
        if isinstance(v, np.ndarray) and v.nbytes >= _SHM_MIN:
            shm = shared_memory.SharedMemory(create=True, size=v.nbytes)
            np.ndarray(v.shape, v.dtype, buffer=shm.buf)[...] = v
            name = shm.name
            # the parent owns the segment's lifetime (it unlinks after
            # copying out); deregister it from THIS process's resource
            # tracker so worker shutdown doesn't double-unlink
            try:
                from multiprocessing import resource_tracker
                resource_tracker.unregister("/" + name, "shared_memory")
            except Exception:
                pass
            shm.close()
            out[k] = ("__shm__", name, v.shape, str(v.dtype))
        else:
            out[k] = v
    return out


def _shm_unpack(sample: Dict) -> Dict:
    from multiprocessing import shared_memory
    out: Dict = {}
    for k, v in sample.items():
        if isinstance(v, tuple) and len(v) == 4 and v[0] == "__shm__":
            _, name, shape, dtype = v
            shm = shared_memory.SharedMemory(name=name)
            try:
                out[k] = np.ndarray(shape, np.dtype(dtype),
                                    buffer=shm.buf).copy()
            finally:
                shm.close()
                shm.unlink()
        else:
            out[k] = v
    return out


def _shm_free(sample: Dict) -> None:
    """Unlink any shm segments referenced by a packed sample WITHOUT the
    copy-out.  Used when a consumer abandons iteration with futures still
    in flight: the worker deliberately unregistered the segment from its
    own resource tracker (see _shm_pack), so nothing else will ever free
    it — the parent must, or the segment (~168 MB at full CT shape)
    outlives the process in /dev/shm."""
    from multiprocessing import shared_memory
    for v in sample.values():
        if isinstance(v, tuple) and len(v) == 4 and v[0] == "__shm__":
            try:
                shm = shared_memory.SharedMemory(name=v[1])
                shm.close()
                shm.unlink()
            except FileNotFoundError:
                pass


def _pool_get(args):
    idx, epoch = args
    if _POOL_DS.epoch != epoch:
        _POOL_DS.set_epoch(epoch)
    return _shm_pack(_POOL_DS[idx])


class BatchLoader:
    """Batched iterator with per-batch bag bucketing and thread prefetch."""

    def __init__(self, dataset: MultimodalDataset, batch_size: int,
                 sampler=None, shuffle: bool = False, seed: int = 0,
                 buckets: Sequence[int] | None = None,
                 prefetch: int = 2, drop_last: bool = False,
                 num_workers: int = 0, pool: str = "thread"):
        self.ds = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.buckets = tuple(buckets or dataset.cfg.bag_buckets)
        self.prefetch = prefetch
        self.drop_last = drop_last
        # parallel per-sample loading (the 16-worker torch DataLoader
        # equivalent, train_ddp.py:75-76).  Safe because the dataset draws
        # augmentation randomness per (epoch, index), not from shared state;
        # results are identical at any worker count.
        self.num_workers = num_workers
        # 'thread' (default: decode/pack/np.load release the GIL) or
        # 'process' (sidesteps the GIL for the pure-python parse stages;
        # spawn context + shared-memory array transport — see the module
        # plumbing above).  Identical batches either way (exact-parity
        # tested).
        if pool not in ("thread", "process"):
            raise ValueError(f"pool must be 'thread' or 'process', "
                             f"got {pool!r}")
        self.pool = pool
        self._proc_executor = None

    def _process_pool(self):
        """Lazily created, reused across epochs (spawn + per-worker dataset
        pickle is expensive; see _produce)."""
        if self._proc_executor is None:
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor
            self._proc_executor = ProcessPoolExecutor(
                self.num_workers, mp_context=mp.get_context("spawn"),
                initializer=_pool_init, initargs=(self.ds,))
        return self._proc_executor

    def close(self) -> None:
        """Shut down the cached process pool (no-op for thread mode)."""
        if self._proc_executor is not None:
            self._proc_executor.shutdown(wait=True)
            self._proc_executor = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        if hasattr(self.ds, "set_epoch"):
            self.ds.set_epoch(epoch)
        if self.sampler is not None:
            self.sampler.set_epoch(epoch)

    def skip_next(self, n_batches: int) -> None:
        """Skip the first ``n_batches`` of the NEXT iteration only — the
        mid-epoch resume hook (train/loop.py).  The epoch's index order is
        deterministic per ``set_epoch`` and augmentation randomness is per
        (epoch, index), so dropping the first ``n·batch_size`` indices
        reproduces the interrupted epoch's remaining batches exactly,
        without paying the skipped samples' host decode."""
        self._skip_once = int(n_batches)

    def __len__(self) -> int:
        n = len(self.sampler) if self.sampler is not None else len(self.ds)
        return n // self.batch_size if self.drop_last \
            else -(-n // self.batch_size)

    def _indices(self) -> np.ndarray:
        if self.sampler is not None:
            return np.asarray(list(self.sampler.indices()))
        idx = np.arange(len(self.ds))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        return idx

    @staticmethod
    def _stack(arrs):
        # batch 1 (the production serving batch): a leading-axis VIEW
        # instead of np.stack's copy — at production size the CT volume
        # alone is a 168 MB memcpy (~40% of the measured 160 ms collate,
        # BENCH_NOTES r3 pass 2)
        if len(arrs) == 1:
            return arrs[0][None]
        return np.stack(arrs)

    def _collate(self, samples: List[Dict]) -> Dict:
        st = self._stack
        batch: Dict = {"ID": [s["ID"] for s in samples]}
        batch["label"] = st([s["label"] for s in samples])
        if "input_CT" in samples[0]:
            batch["input_CT"] = st([s["input_CT"] for s in samples])
        if "mask_CT" in samples[0]:
            batch["mask_CT"] = st([s["mask_CT"] for s in samples])
        if "input_pathology" in samples[0]:
            longest = max(s["input_pathology"].shape[0] for s in samples)
            target = bucket_for(longest, self.buckets)
            feats, masks = zip(*(pad_bag(s["input_pathology"], target)
                                 for s in samples))
            batch["input_pathology"] = st(list(feats))
            batch["mask_pathology"] = st(list(masks))
            batch["BpRc_class"] = st([s["BpRc_class"] for s in samples])
        batch["input_CI"] = st([s["input_CI"] for s in samples])
        return batch

    def _produce(self) -> Iterator[Dict]:
        idx = self._indices()
        if self.drop_last:
            idx = idx[:len(idx) - len(idx) % self.batch_size]
        skip = getattr(self, "_skip_once", 0)
        if skip:
            self._skip_once = 0               # one-shot: next epoch is full
            idx = idx[skip * self.batch_size:]
        if self.num_workers > 1:
            # windowed CROSS-batch sample pipeline: per-sample futures with
            # a bounded in-flight window, yielded in order.  A per-batch
            # pool.map would cap parallelism at batch_size (zero at the
            # production serving batch of 1).  Thread mode: the hot
            # per-sample work — gzip inflate (libdeflate/zlib), the C++
            # packer, np.load — all releases the GIL.  Process mode: the
            # GIL-holding parse stages scale too (see module plumbing).
            from collections import deque
            if self.pool == "process":
                # cached across epochs: 'spawn' re-imports + re-pickles the
                # cohort DataFrame and feature store per worker, a
                # significant cost on the 1-core host; the epoch rides with
                # each index (workers re-sync via _pool_get) precisely so
                # the pool does NOT need re-creation per epoch
                pool = self._process_pool()
                own_pool = False
                epoch = self.ds.epoch

                def submit(pool, i):
                    return pool.submit(_pool_get, (int(i), epoch))

                post = _shm_unpack
            else:
                from concurrent.futures import ThreadPoolExecutor
                pool = ThreadPoolExecutor(self.num_workers)
                own_pool = True

                def submit(pool, i):
                    return pool.submit(self.ds.__getitem__, int(i))

                def post(s):
                    return s

            window = max(self.num_workers * 2, self.batch_size)
            futs: deque = deque()
            try:
                pos = 0
                for start in range(0, len(idx), self.batch_size):
                    chunk = idx[start:start + self.batch_size]
                    while pos < len(idx) and len(futs) < len(chunk) + window:
                        futs.append(submit(pool, idx[pos]))
                        pos += 1
                    yield self._collate(
                        [post(futs.popleft().result()) for _ in chunk])
            finally:
                # consumer abandoned mid-epoch (preemption break in
                # train/loop.py, tests stopping after n batches) or
                # finished: cancel what never started and free the shm
                # behind anything already in flight — those segments are
                # deregistered from the workers' resource trackers and
                # would otherwise leak past process exit
                for f in futs:
                    if not f.cancel() and self.pool == "process":
                        try:
                            _shm_free(f.result())
                        except Exception:
                            pass
                if own_pool:
                    pool.shutdown(wait=True)
            return
        for start in range(0, len(idx), self.batch_size):
            chunk = idx[start:start + self.batch_size]
            yield self._collate([self.ds[int(i)] for i in chunk])

    def first_batch(self) -> Dict:
        """One batch without spinning up the prefetch worker — for model
        init (an abandoned prefetching iterator would leave its thread
        blocked on a full queue holding collated batches)."""
        return next(self._produce())

    def __iter__(self) -> Iterator[Dict]:
        if self.prefetch <= 0:
            yield from self._produce()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _END = object()
        err: List[BaseException] = []
        stop = threading.Event()

        def worker():
            try:
                for b in self._produce():
                    while not stop.is_set():
                        try:
                            q.put(b, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:          # surface worker errors
                err.append(e)
            finally:
                # the END sentinel must not be dropped on a full queue or
                # the consumer blocks forever — retry until delivered or
                # the consumer has gone away
                while not stop.is_set():
                    try:
                        q.put(_END, timeout=0.2)
                        break
                    except queue.Full:
                        continue
            return

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                yield item
        finally:
            # consumer abandoned (GeneratorExit) or finished: release the
            # worker so it doesn't sit blocked holding collated batches
            stop.set()
            t.join(timeout=5)
        if err:
            raise err[0]
