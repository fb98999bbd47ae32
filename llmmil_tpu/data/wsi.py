"""Image-only WSI patch pipeline: tiling, CLIP preprocessing, batched
patch encoding (BASELINE.json config #2).

The reference never ships a WSI→bag path — it consumes precomputed
CTransPath features (``dataset.py:367``) and loads (but never runs) the
CLIP vision tower (SURVEY.md §2.3).  This module closes that gap
TPU-first: a host-side tile reader feeds fixed-shape tile batches to the
jitted ViT-B/32 patch encoder (``models/clip_vision.py``) — an
embarrassingly MXU-shaped workload — producing the (N, embed) bags the
MIL aggregators already consume.

Parity anchors:
- preprocessing mirrors what the reference's ``clip.load`` returns
  (``clip/clip.py:71-78``): bicubic resize of the SHORTER side to n_px,
  center crop, CLIP mean/std normalization.  The resize reproduces
  PIL/torchvision's convolution resampling (cubic a=-0.5, support scaled
  by the downscale ratio — i.e. antialiased) in pure numpy, cross-checked
  against PIL in tests/test_wsi.py;
- the encoded-bag directory layout matches the reference's feature store
  (``{root}/{hospital}/{Biopsy|Resection}/{pid}.npy``) so training
  consumes WSI-encoded bags through the exact same loader path.

Intended production flow: ``scripts/encode_wsi.py`` precomputes all bags
as one batched TPU job (reporting tiles/s); ``Config.pathology_source =
'wsi'`` additionally lets the dataset encode-and-cache on first touch.
"""

from __future__ import annotations

import os
import threading
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

# the reference's CLIP normalization constants (clip/clip.py:77)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

__all__ = [
    "CLIP_MEAN", "CLIP_STD", "resize_bicubic", "center_crop",
    "clip_preprocess", "tile_grid", "foreground_fraction", "read_slide",
    "extract_tiles", "encode_slide", "PatchEncoder",
]


# ---------------------------------------------------------------------------
# PIL-equivalent antialiased bicubic resize (pure numpy, separable).
# ---------------------------------------------------------------------------

def _cubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic kernel with a=-0.5 (PIL's BICUBIC filter)."""
    ax = np.abs(x)
    return np.where(
        ax < 1, ((a + 2) * ax - (a + 3)) * ax * ax + 1,
        np.where(ax < 2, a * (((ax - 5) * ax + 8) * ax - 4), 0.0))


def _coeffs(in_size: int, out_size: int):
    """Per-output-pixel gather indices + normalized weights, PIL's
    precompute_coeffs: filter support scales with the downscale ratio
    (antialiasing), window [xmin, xmax) clipped to the image."""
    scale = in_size / out_size
    fs = max(scale, 1.0)
    support = 2.0 * fs
    ksize = int(np.ceil(support)) * 2 + 1
    centers = (np.arange(out_size, dtype=np.float64) + 0.5) * scale
    xmin = np.maximum((centers - support + 0.5).astype(np.int64), 0)
    xmax = np.minimum((centers + support + 0.5).astype(np.int64), in_size)
    idx = xmin[:, None] + np.arange(ksize)[None, :]       # (out, ksize)
    valid = idx < xmax[:, None]
    w = _cubic((idx - centers[:, None] + 0.5) / fs) * valid
    w = w / w.sum(axis=1, keepdims=True)
    return np.clip(idx, 0, in_size - 1), w.astype(np.float32)


def resize_bicubic(img: np.ndarray, out_h: int, out_w: int,
                   clamp: Optional[Tuple[float, float]] = None
                   ) -> np.ndarray:
    """Antialiased bicubic resize of (H, W[, C]) float/uint8 → float32.

    ``clamp=(lo, hi)`` clips after EACH separable pass — PIL's uint8 path
    clamps cubic overshoot to [0, 255] per stage, and matching it matters
    for parity with the reference's PIL-based preprocess."""
    squeeze = img.ndim == 2
    img = np.asarray(img, np.float32)
    if squeeze:
        img = img[..., None]
    if img.shape[1] != out_w:
        idx, w = _coeffs(img.shape[1], out_w)
        img = np.einsum("hokc,ok->hoc", img[:, idx], w)
        if clamp is not None:
            img = np.clip(img, *clamp)
    if img.shape[0] != out_h:
        idx, w = _coeffs(img.shape[0], out_h)
        img = np.einsum("okwc,ok->owc", img[idx], w)
        if clamp is not None:
            img = np.clip(img, *clamp)
    return img[..., 0] if squeeze else img


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    """torchvision CenterCrop semantics (round-half-even top-left)."""
    h, w = img.shape[:2]
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    if top < 0 or left < 0:
        pad = ((max(-top, 0), max(size - h + min(top, 0), 0)),
               (max(-left, 0), max(size - w + min(left, 0), 0))) \
            + ((0, 0),) * (img.ndim - 2)
        img = np.pad(img, pad)
        top, left = max(top, 0), max(left, 0)
    return img[top:top + size, left:left + size]


def clip_preprocess(img: np.ndarray, n_px: int = 224) -> np.ndarray:
    """The reference's CLIP preprocess (clip/clip.py:71-78): shorter-side
    bicubic resize → center crop → [0,1] → CLIP mean/std.  uint8 inputs
    are scaled by /255; float inputs are assumed already in [0, 1].
    Returns (n_px, n_px, 3) float32."""
    img = np.asarray(img)
    was_uint8 = img.dtype == np.uint8
    scale = np.float32(1.0 / 255.0) if was_uint8 else np.float32(1.0)
    img = img.astype(np.float32) * scale
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    h, w = img.shape[:2]
    if min(h, w) != n_px or max(h, w) < n_px:
        # torchvision Resize(int): shorter side → n_px, aspect preserved
        if w <= h:
            ow, oh = n_px, max(int(n_px * h / w), n_px)
        else:
            oh, ow = n_px, max(int(n_px * w / h), n_px)
        img = resize_bicubic(img, oh, ow,
                             clamp=(0.0, 1.0) if was_uint8 else None)
    img = center_crop(img, n_px)
    return (img - CLIP_MEAN) / CLIP_STD


# ---------------------------------------------------------------------------
# Tiling.
# ---------------------------------------------------------------------------

def tile_grid(h: int, w: int, tile: int,
              stride: Optional[int] = None) -> np.ndarray:
    """(N, 2) array of (y, x) top-left corners covering the image with
    FULL tiles only (partial edge tiles are dropped — background-heavy
    remainders would dilute the bag)."""
    stride = stride or tile
    ys = np.arange(0, max(h - tile + 1, 0), stride)
    xs = np.arange(0, max(w - tile + 1, 0), stride)
    if len(ys) == 0 or len(xs) == 0:
        return np.zeros((0, 2), np.int64)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([yy.ravel(), xx.ravel()], axis=1)


def foreground_fraction(tile: np.ndarray,
                        white_thresh: float = 0.86) -> float:
    """Fraction of non-background pixels.  WSI background is near-white
    scanner glass: a pixel is background when every channel exceeds
    ``white_thresh`` (on the [0,1] scale; uint8 inputs are scaled)."""
    t = np.asarray(tile)
    if t.dtype == np.uint8:
        t = t.astype(np.float32) / 255.0
    bg = (t >= white_thresh).all(axis=-1) if t.ndim == 3 \
        else (t >= white_thresh)
    return float(1.0 - bg.mean())


def read_slide(path: str) -> np.ndarray:
    """Slide/region image as (H, W, 3).  ``.npy`` (pre-exported region) or
    any PIL-readable raster.  Pyramidal formats (.svs/.ndpi) need an
    OpenSlide-style export to one of these first — openslide is not in
    this environment's dependency set."""
    if path.endswith(".npy"):
        img = np.load(path)
    else:
        from PIL import Image
        with Image.open(path) as im:
            img = np.asarray(im.convert("RGB"))
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    return img


def extract_tiles(image: np.ndarray, tile: int,
                  stride: Optional[int] = None,
                  min_foreground: float = 0.0,
                  out_px: Optional[int] = None,
                  preprocess: bool = True) -> Tuple[np.ndarray,
                                                    np.ndarray]:
    """Tile (+ optionally preprocess) one slide.

    Returns ``(tiles, positions)``: tiles (N, out_px, out_px, 3) float32
    CLIP-normalized (or raw uint8 when ``preprocess=False`` — the
    normalize-on-device path: a uint8 tile batch is 4× fewer host→device
    bytes, which is THE bottleneck on a tunneled chip), positions (N, 2)
    the surviving (y, x) corners.  ``min_foreground > 0`` drops
    background tiles BEFORE the (costly) preprocess.  ``out_px`` defaults
    to ``tile`` (no resize when the grid is cut at the encoder's native
    224); the raw path requires tile == out_px."""
    out_px = out_px or tile
    if not preprocess and out_px != tile:
        raise ValueError("raw (preprocess=False) tiles need tile == out_px"
                         " — the resize runs in clip_preprocess")
    h, w = image.shape[:2]
    stride_ = stride or tile
    if not preprocess and min_foreground <= 0 and stride_ == tile \
            and image.ndim == 3 and image.shape[-1] == 3:
        # fast vectorized grid cut (no per-tile python loop)
        gh, gw = h // tile, w // tile
        tiles = image[:gh * tile, :gw * tile] \
            .reshape(gh, tile, gw, tile, 3) \
            .transpose(0, 2, 1, 3, 4).reshape(-1, tile, tile, 3)
        return np.ascontiguousarray(tiles), \
            tile_grid(h, w, tile, stride_)
    pos = tile_grid(h, w, tile, stride)
    keep, proc = [], []
    for y, x in pos:
        t = image[y:y + tile, x:x + tile]
        if min_foreground > 0 and \
                foreground_fraction(t) < min_foreground:
            continue
        keep.append((y, x))
        proc.append(clip_preprocess(t, out_px) if preprocess else t)
    if not proc:
        dt = np.float32 if preprocess else image.dtype
        return (np.zeros((0, out_px, out_px, 3), dt),
                np.zeros((0, 2), np.int64))
    return np.stack(proc), np.asarray(keep, np.int64)


def encode_slide(encode_fn: Callable[[np.ndarray], np.ndarray],
                 image: np.ndarray, tile: int = 224,
                 stride: Optional[int] = None, batch: int = 256,
                 min_foreground: float = 0.0,
                 out_px: Optional[int] = None,
                 preprocess: bool = True,
                 embed_dim: Optional[int] = None) -> Tuple[np.ndarray,
                                                           np.ndarray]:
    """Slide → (N, embed) bag + (N, 2) tile positions.

    ``encode_fn`` maps a (batch, px, px, 3) array to (batch, embed) — it
    is always called at the FULL fixed batch (the tail is zero-padded
    then truncated) so a jitted encoder compiles exactly once.
    ``preprocess=False`` ships RAW uint8 tiles (the encoder normalizes
    on device — 4× fewer h2d bytes; PatchEncoder supports this)."""
    tiles, pos = extract_tiles(image, tile, stride, min_foreground,
                               out_px, preprocess=preprocess)
    n = tiles.shape[0]
    if n == 0:
        # a blank/filtered-out slide must not trigger a full encoder
        # compile (minutes on the tunneled backend) just to learn the
        # embedding dim — callers that know it pass embed_dim
        if embed_dim is None:
            probe = encode_fn(np.zeros((batch,) + tiles.shape[1:],
                                       tiles.dtype))
            embed_dim = probe.shape[-1]
        return np.zeros((0, embed_dim), np.float32), pos
    chunks = []
    for start in range(0, n, batch):
        chunk = tiles[start:start + batch]
        if chunk.shape[0] < batch:          # static shape for jit
            chunk = np.concatenate(
                [chunk, np.zeros((batch - chunk.shape[0],)
                                 + chunk.shape[1:], tiles.dtype)])
        chunks.append(np.asarray(encode_fn(chunk)))
    return np.concatenate(chunks)[:n].astype(np.float32), pos


class PatchEncoder:
    """Jitted CLIP-ViT patch encoder with a fixed tile batch.

    ``PatchEncoder(variables, cfg)`` wraps
    :class:`~llmmil_tpu.models.clip_vision.CLIPVisionTransformer`;
    ``from_config(cfg)`` builds it from a :class:`Config` — importing a
    torch CLIP checkpoint when ``cfg.patch_encoder_ckpt`` is set, else
    seeding deterministic random weights (synthetic pipelines; a loud
    warning is printed since random patch features carry no signal).
    """

    def __init__(self, variables, vision_cfg, batch: int = 256,
                 dtype=None):
        import jax
        import jax.numpy as jnp
        from ..models.clip_vision import make_vision_tower

        self.vision_cfg = vision_cfg
        self.batch = batch
        self.embed_dim = vision_cfg.embed_dim
        tower = make_vision_tower(vision_cfg,
                                  dtype or jnp.bfloat16)
        self._lock = threading.Lock()
        # weights ride as jit ARGUMENTS, not closure constants — baked-in
        # constants ship the full ViT-B/32 (~350 MB) inside the compile
        # request, which the tunneled remote compiler rejects (HTTP 413)
        self._variables = jax.device_put(variables)

        @jax.jit
        def run(variables, imgs):
            if imgs.dtype == jnp.uint8:
                # normalize-on-device path: raw uint8 tiles cost 4× fewer
                # bytes over the (bandwidth-bound) host→device link
                x = imgs.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
                x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
            else:
                x = imgs
            out = tower.apply(variables, x)
            return out.astype(jnp.float32)

        self._run = run

    def __call__(self, tiles: np.ndarray) -> np.ndarray:
        # one device program at a time (CLAUDE.md: two contending
        # programs deadlock the single tunneled chip)
        with self._lock:
            return np.asarray(self._run(self._variables, tiles))

    def encode(self, image: np.ndarray, tile: int = 224,
               stride: Optional[int] = None, min_foreground: float = 0.0,
               out_px: Optional[int] = None, pipelined: bool = True):
        px = out_px or self.vision_cfg.image_resolution
        image = np.asarray(image)
        # raw uint8 transport whenever no host-side resize is needed
        raw = (image.dtype == np.uint8 and tile == px
               and image.ndim == 3 and image.shape[-1] == 3)
        if pipelined:
            return self._encode_pipelined(image, tile, stride,
                                          min_foreground, px,
                                          preprocess=not raw)
        return encode_slide(self, image, tile=tile, stride=stride,
                            batch=self.batch,
                            min_foreground=min_foreground, out_px=px,
                            preprocess=not raw,
                            embed_dim=self.embed_dim)

    def _encode_pipelined(self, image, tile, stride, min_foreground, px,
                          preprocess):
        """encode_slide with DOUBLE-BUFFERED tile upload: a producer
        thread pads chunks and issues their host→device transfer (bounded
        2 in flight) while the main thread blocks on the previous chunk's
        encode — overlapping the ~45 MB/s tunnel h2d with device compute
        and host padding (VERDICT r4 #6: the serial loop paid them
        back-to-back).  Same chunks, same order, same programs → bag
        identical to the serial path (tests/test_wsi.py pins it)."""
        import queue as queue_mod
        import threading

        import jax

        tiles, pos = extract_tiles(image, tile, stride, min_foreground,
                                   px, preprocess=preprocess)
        n = tiles.shape[0]
        if n == 0:
            return np.zeros((0, self.embed_dim), np.float32), pos

        batch = self.batch
        q: "queue_mod.Queue" = queue_mod.Queue(maxsize=2)
        err: list = []

        def producer():
            try:
                for start in range(0, n, batch):
                    chunk = tiles[start:start + batch]
                    if chunk.shape[0] < batch:   # static shape for jit
                        chunk = np.concatenate(
                            [chunk, np.zeros((batch - chunk.shape[0],)
                                             + chunk.shape[1:],
                                             tiles.dtype)])
                    q.put(jax.device_put(chunk))
            except BaseException as e:           # surface in the consumer
                err.append(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        outs = []
        while True:
            dev = q.get()
            if dev is None:
                break
            with self._lock:
                outs.append(np.asarray(self._run(self._variables, dev)))
        t.join()
        if err:
            raise err[0]
        return np.concatenate(outs)[:n].astype(np.float32), pos

    @classmethod
    def from_config(cls, cfg, batch: Optional[int] = None):
        import jax.numpy as jnp
        from ..models.clip_vision import (CLIPVisionConfig,
                                          convert_torch_clip_vision_state_dict,
                                          infer_clip_arch,
                                          make_vision_tower)
        if cfg.patch_encoder_ckpt:
            import torch
            sd = torch.load(cfg.patch_encoder_ckpt, map_location="cpu")
            sd = getattr(sd, "state_dict", lambda: sd)()
            vcfg = infer_clip_arch(sd)[0]
            conv = convert_torch_clip_vision_state_dict(sd, vcfg)
            variables = conv if "params" in conv else {"params": conv}
        else:
            import jax
            print("[wsi] patch_encoder_ckpt unset — using seeded RANDOM "
                  "ViT weights (pipeline/testing only; encoded features "
                  "carry no pretrained signal)", flush=True)
            vcfg = CLIPVisionConfig(
                image_resolution=cfg.wsi_px, patch_size=cfg.wsi_patch,
                width=cfg.wsi_vit_width, layers=cfg.wsi_vit_layers,
                heads=max(cfg.wsi_vit_width // 64, 1),
                embed_dim=cfg.wsi_embed_dim)
            tower = make_vision_tower(vcfg, jnp.float32)
            variables = tower.init(
                jax.random.PRNGKey(cfg.seed),
                jnp.zeros((1, vcfg.image_resolution,
                           vcfg.image_resolution, 3), jnp.float32))
        return cls(variables, vcfg, batch=batch or cfg.wsi_encode_batch)
