"""Process-pool loader mode (BatchLoader(pool='process')) — exact parity.

The GIL-holding per-sample stages (pure-python DICOM/NRRD parse, BPE,
cohort glue) can only scale across cores in processes; this mode spawns
workers, ships the dataset once via the pool initializer, and returns
large arrays through POSIX shared memory.  Invariants:

- batches are byte-identical to the serial (workers=0) and thread-pool
  paths, WITH augmentation on — the per-(epoch, index) RNG streams make
  worker scheduling invisible;
- epoch changes flow into the persistent-RNG streams without recreating
  the pool (epoch rides along with each submitted index);
- arrays above the shared-memory threshold round-trip exactly and the
  segments are unlinked (no leak).
"""

import numpy as np

from llmmil_tpu.config import Config
from llmmil_tpu.data.pipeline import (BatchLoader, SyntheticCohort,
                                      _SHM_MIN, _shm_pack, _shm_unpack)


def _cfg():
    return Config(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                  model_pathology="ABMIL", aggregator="ABMIL",
                  model_CI="simpleFCs_v1", CI_input_version="v1",
                  loss_point="Last", learnablePrompt=0,
                  compute_dtype="float32", augmentation=1,
                  spacing=[2.0, 2.0, 2.5], ct_hw_override=96,
                  ct_shape=[32, 96, 96], bag_buckets=[64, 128, 256],
                  num_workers=0)


def _batches(loader, epoch=0, n=3):
    loader.set_epoch(epoch)
    out = []
    for i, b in enumerate(loader):
        out.append(b)
        if i + 1 >= n:
            break
    return out


def _assert_same(bs1, bs2):
    assert len(bs1) == len(bs2)
    for b1, b2 in zip(bs1, bs2):
        assert b1.keys() == b2.keys()
        assert b1["ID"] == b2["ID"]
        for k in b1:
            if k == "ID":
                continue
            np.testing.assert_array_equal(b1[k], b2[k], err_msg=k)


def test_shm_pack_roundtrip():
    rs = np.random.RandomState(0)
    big = rs.rand(*(int(np.ceil(_SHM_MIN / 8)) + 7, 1)).astype(np.float64)
    assert big.nbytes >= _SHM_MIN
    sample = {"big": big, "small": np.arange(4, dtype=np.int32),
              "ID": "P1"}
    packed = _shm_pack(dict(sample))
    assert isinstance(packed["big"], tuple) and packed["big"][0] == \
        "__shm__"
    assert isinstance(packed["small"], np.ndarray)   # under threshold
    out = _shm_unpack(packed)
    np.testing.assert_array_equal(out["big"], big)
    np.testing.assert_array_equal(out["small"], sample["small"])
    # the segment is gone (unlink happened)
    from multiprocessing import shared_memory
    try:
        shared_memory.SharedMemory(name=packed["big"][1])
        raise AssertionError("shm segment leaked")
    except FileNotFoundError:
        pass


def test_process_pool_exact_parity_with_augmentation():
    cfg = _cfg()
    syn = SyntheticCohort(cfg, n_per_hospital=2, ct_shape=(32, 96, 96),
                          bag_range=(20, 60), seed=0)

    serial = BatchLoader(syn.dataset(cfg, "train"), 2, shuffle=True,
                         prefetch=0, num_workers=0)
    procs = BatchLoader(syn.dataset(cfg, "train"), 2, shuffle=True,
                        prefetch=0, num_workers=2, pool="process")

    # the CT sample crosses the shared-memory threshold
    assert 32 * 96 * 96 * 4 >= _SHM_MIN

    _assert_same(_batches(serial, epoch=0), _batches(procs, epoch=0))
    # epoch flows into the per-(epoch, index) RNG streams through the
    # SAME pool path (augmented batches differ across epochs but match
    # across pool modes)
    e0, e1 = _batches(serial, epoch=0, n=1), _batches(serial, epoch=1, n=1)
    assert not np.array_equal(e0[0]["input_CT"], e1[0]["input_CT"])
    _assert_same(e1, _batches(procs, epoch=1, n=1))


def test_thread_pool_still_exact():
    cfg = _cfg()
    syn = SyntheticCohort(cfg, n_per_hospital=2, ct_shape=(32, 96, 96),
                          bag_range=(20, 60), seed=0)
    serial = BatchLoader(syn.dataset(cfg, "train"), 2, shuffle=True,
                         prefetch=0, num_workers=0)
    threads = BatchLoader(syn.dataset(cfg, "train"), 2, shuffle=True,
                          prefetch=0, num_workers=2, pool="thread")
    _assert_same(_batches(serial), _batches(threads))


def test_abandoned_iteration_frees_shm_and_reuses_pool():
    """Breaking out of a process-pool iteration must not leak the shm
    segments behind in-flight futures (ADVICE r4: the worker deliberately
    deregisters them from its own resource tracker, so only the parent
    can free them), and the pool must be reused across epochs (spawn +
    per-worker dataset pickle is expensive on a 1-core host)."""
    import glob
    cfg = _cfg()
    syn = SyntheticCohort(cfg, n_per_hospital=3, ct_shape=(32, 96, 96),
                          bag_range=(20, 60), seed=0)
    procs = BatchLoader(syn.dataset(cfg, "train"), 1, shuffle=True,
                        prefetch=0, num_workers=2, pool="process")

    def shm_names():
        return set(glob.glob("/dev/shm/psm_*") + glob.glob("/dev/shm/shm_*")
                   + glob.glob("/dev/shm/wnsm_*"))

    before = shm_names()
    # abandon after 1 of ~6 batches, twice — the window keeps several
    # futures in flight at the break
    _batches(procs, epoch=0, n=1)
    pool1 = procs._proc_executor
    assert pool1 is not None
    _batches(procs, epoch=1, n=1)
    assert procs._proc_executor is pool1, "pool was recreated per epoch"
    leaked = shm_names() - before
    assert not leaked, f"abandoned iteration leaked shm segments: {leaked}"
    procs.close()
    assert procs._proc_executor is None
