"""Image-only WSI patch pipeline (data/wsi.py) — BASELINE config #2.

Invariants:
- the pure-numpy antialiased bicubic resize matches PIL's convolution
  resampling to float epsilon (the reference preprocess goes through
  torchvision Resize → PIL, clip/clip.py:71-78);
- clip_preprocess matches the torchvision Compose the reference's
  clip.load returns on uint8 images (tolerance = PIL's 8-bit rounding);
- tiling covers with full tiles only; the background filter drops white
  tiles; encode_slide's fixed-batch padding is invisible in the output;
- PatchEncoder is deterministic from Config.seed;
- the dataset's pathology_source='wsi' path yields encoder-dim bags
  through the normal loader/collate machinery, caches them, and feeds a
  runnable modality=['pathology'] model end to end.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmmil_tpu.config import Config
from llmmil_tpu.data import wsi as W


# ---------------------------------------------------------------------------
# resize / preprocess parity
# ---------------------------------------------------------------------------

def test_resize_bicubic_matches_pil():
    from PIL import Image
    rs = np.random.RandomState(0)
    for (h, w), (oh, ow) in [((64, 48), (224, 224)),     # upscale
                             ((300, 200), (100, 50)),    # downscale (AA)
                             ((97, 131), (32, 45))]:     # both axes odd
        img = rs.rand(h, w).astype(np.float32)
        want = np.asarray(Image.fromarray(img, mode="F")
                          .resize((ow, oh), Image.BICUBIC))
        got = W.resize_bicubic(img, oh, ow)
        np.testing.assert_allclose(got, want, atol=1e-5)
    # channel axis handled identically per channel
    img3 = rs.rand(50, 70, 3).astype(np.float32)
    got3 = W.resize_bicubic(img3, 30, 20)
    for c in range(3):
        np.testing.assert_allclose(got3[..., c],
                                   W.resize_bicubic(img3[..., c], 30, 20),
                                   atol=1e-6)


def test_clip_preprocess_matches_pil_reference():
    """Oracle = the reference transform's semantics (clip/clip.py:71-78)
    executed with PIL itself: shorter-side bicubic resize (torchvision
    Resize(int) size rule), round-half center crop, /255, CLIP mean/std.
    torchvision isn't in this environment; PIL is the component that
    carries the resampling numerics either way."""
    from PIL import Image

    n_px = 48
    rs = np.random.RandomState(1)
    for shape in [(64, 96, 3), (80, 48, 3), (48, 48, 3), (33, 60, 3)]:
        img = rs.randint(0, 256, shape, dtype=np.uint8)
        h, w = shape[:2]
        if w <= h:
            ow, oh = n_px, max(int(n_px * h / w), n_px)
        else:
            oh, ow = n_px, max(int(n_px * w / h), n_px)
        ref = np.asarray(Image.fromarray(img).resize((ow, oh),
                                                     Image.BICUBIC),
                         dtype=np.float32) / 255.0
        top = int(round((oh - n_px) / 2.0))
        left = int(round((ow - n_px) / 2.0))
        ref = ref[top:top + n_px, left:left + n_px]
        want = (ref - W.CLIP_MEAN) / W.CLIP_STD

        got = W.clip_preprocess(img, n_px=n_px)
        assert got.shape == (n_px, n_px, 3)
        # PIL's uint8 resize rounds each stage to 8 bits; our float path
        # doesn't — bound is ~1/255/min(std)
        np.testing.assert_allclose(got, want, atol=0.03)


def test_clip_preprocess_float_and_gray():
    rs = np.random.RandomState(2)
    img = rs.rand(32, 32).astype(np.float32)           # gray float [0,1]
    out = W.clip_preprocess(img, n_px=32)
    assert out.shape == (32, 32, 3)
    want = (img - W.CLIP_MEAN[0]) / W.CLIP_STD[0]
    np.testing.assert_allclose(out[..., 0], want, atol=1e-6)


# ---------------------------------------------------------------------------
# tiling
# ---------------------------------------------------------------------------

def test_tile_grid_full_tiles_only():
    pos = W.tile_grid(100, 70, 32)
    assert pos.shape == (3 * 2, 2)
    assert pos[:, 0].max() + 32 <= 100 and pos[:, 1].max() + 32 <= 70
    # overlapping stride
    pos2 = W.tile_grid(64, 64, 32, stride=16)
    assert len(pos2) == 3 * 3
    # image smaller than a tile → empty
    assert W.tile_grid(16, 100, 32).shape == (0, 2)


def test_foreground_filter_drops_background():
    white = np.full((16, 16, 3), 250, np.uint8)
    tissue = np.full((16, 16, 3), 120, np.uint8)
    assert W.foreground_fraction(white) < 0.05
    assert W.foreground_fraction(tissue) > 0.95
    img = np.full((16, 32, 3), 255, np.uint8)
    img[:, :16] = 100
    tiles, pos = W.extract_tiles(img, 16, min_foreground=0.5)
    assert len(tiles) == 1 and tuple(pos[0]) == (0, 0)


def test_encode_slide_batch_padding_invisible():
    rs = np.random.RandomState(3)
    proj = rs.randn(16 * 16 * 3, 8).astype(np.float32)

    def encode_fn(tiles):                      # (B,16,16,3) → (B,8)
        return tiles.reshape(tiles.shape[0], -1) @ proj

    img = rs.randint(0, 256, (48, 64, 3), dtype=np.uint8)   # 3x4 tiles
    bag_small, pos = W.encode_slide(encode_fn, img, tile=16, batch=5)
    bag_big, _ = W.encode_slide(encode_fn, img, tile=16, batch=64)
    assert bag_small.shape == (12, 8) and pos.shape == (12, 2)
    np.testing.assert_allclose(bag_small, bag_big, atol=1e-5)

    empty, _ = W.encode_slide(encode_fn, np.zeros((8, 8, 3), np.uint8),
                              tile=16, batch=4)
    assert empty.shape == (0, 8)


# ---------------------------------------------------------------------------
# PatchEncoder
# ---------------------------------------------------------------------------

def _tiny_wsi_cfg(**kw):
    return Config(modality=["pathology"], model_pathology="ABMIL",
                  aggregator="ABMIL", model_CI="simpleFCs_v1",
                  CI_input_version="v1", loss_point="Last",
                  learnablePrompt=0, compute_dtype="float32",
                  pathology_source="wsi", wsi_tile=32, wsi_px=32,
                  wsi_patch=16, wsi_vit_width=32, wsi_vit_layers=1,
                  wsi_embed_dim=16, wsi_encode_batch=8,
                  bag_buckets=[4, 8, 16], **kw)


def test_patch_encoder_deterministic_from_seed(capsys):
    cfg = _tiny_wsi_cfg()
    enc1 = W.PatchEncoder.from_config(cfg)
    enc2 = W.PatchEncoder.from_config(cfg)
    assert "RANDOM" in capsys.readouterr().out   # loud random-init warning
    img = np.random.RandomState(4).randint(0, 256, (64, 64, 3),
                                           dtype=np.uint8)
    bag1, pos1 = enc1.encode(img, tile=cfg.wsi_tile)
    bag2, _ = enc2.encode(img, tile=cfg.wsi_tile)
    assert bag1.shape == (4, 16)
    np.testing.assert_array_equal(bag1, bag2)
    assert pos1.shape == (4, 2)


def test_patch_encoder_pipelined_matches_serial(capsys):
    """The double-buffered upload path (VERDICT r4 #6) is a scheduling
    change only: bag and positions identical to the serial encode_slide
    loop, including multi-chunk slides with a padded tail."""
    cfg = _tiny_wsi_cfg()
    enc = W.PatchEncoder.from_config(cfg, batch=2)   # 4 tiles -> 2 chunks
    capsys.readouterr()
    img = np.random.RandomState(5).randint(0, 256, (64, 64, 3),
                                           dtype=np.uint8)
    bag_p, pos_p = enc.encode(img, tile=cfg.wsi_tile, pipelined=True)
    bag_s, pos_s = enc.encode(img, tile=cfg.wsi_tile, pipelined=False)
    np.testing.assert_array_equal(bag_p, bag_s)
    np.testing.assert_array_equal(pos_p, pos_s)
    # odd tile count exercises the padded tail chunk
    img2 = np.random.RandomState(6).randint(0, 256, (96, 32, 3),
                                            dtype=np.uint8)   # 3 tiles
    bag_p2, _ = enc.encode(img2, tile=cfg.wsi_tile, pipelined=True)
    bag_s2, _ = enc.encode(img2, tile=cfg.wsi_tile, pipelined=False)
    assert bag_p2.shape[0] == 3
    np.testing.assert_array_equal(bag_p2, bag_s2)


# ---------------------------------------------------------------------------
# dataset integration: image-only config end to end
# ---------------------------------------------------------------------------

def test_wsi_dataset_bags_and_cache(tmp_path):
    from llmmil_tpu.data.pipeline import BatchLoader, SyntheticCohort

    cfg = _tiny_wsi_cfg(wsi_cache_dir=str(tmp_path / "wsi_cache"),
                        augmentation=0)
    syn = SyntheticCohort(cfg, n_per_hospital=2, wsi_shape=(64, 96),
                          seed=0)
    ds = syn.dataset(cfg, "train")
    assert len(ds) > 0
    s = ds[0]
    assert s["input_pathology"].shape == (2 * 3, cfg.wsi_embed_dim)
    # cache populated; second load identical without re-encoding
    cached = list(os.walk(cfg.wsi_cache_dir))
    assert any(f for _, _, fs in cached for f in fs)
    s2 = ds[0]
    np.testing.assert_array_equal(s["input_pathology"],
                                  s2["input_pathology"])

    # collate through the normal loader: mask + bucket padding
    loader = BatchLoader(ds, batch_size=2, buckets=cfg.bag_buckets)
    batch = next(iter(loader))
    assert batch["input_pathology"].shape == (2, 8, cfg.wsi_embed_dim)
    assert batch["mask_pathology"].sum(axis=1).tolist() == [6, 6]

    # runnable image-only model on the encoded bags
    from llmmil_tpu.models import build_model
    model = build_model(cfg)
    feed = {k: jnp.asarray(v) for k, v in batch.items() if k != "ID"}
    variables = model.init(jax.random.PRNGKey(0), feed)
    out = model.apply(variables, feed,
                      rngs={"dropout": jax.random.PRNGKey(1)})
    probs = out["probs"] if isinstance(out, dict) else out
    assert probs.shape == (2, cfg.num_classes)
    assert bool(jnp.isfinite(probs).all())


def test_wsi_missing_slide_is_loud():
    cfg = _tiny_wsi_cfg(path_data_wsi="/nonexistent/wsi")
    from llmmil_tpu.data.pipeline import SyntheticCohort
    syn = SyntheticCohort(cfg, n_per_hospital=2, seed=0)  # no wsi_shape
    ds = syn.dataset(cfg, "train")
    with pytest.raises(FileNotFoundError, match="pathology_source"):
        ds[0]
