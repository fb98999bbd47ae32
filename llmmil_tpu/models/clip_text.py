"""CLIP text encoder ("the LLM") + CoOp learnable-prompt clinical encoder.

Parity targets: the vendored CLIP text tower (``clip/model.py:150-352``:
ResidualAttentionBlock with QuickGELU, causal mask, ln_final, EOT-pool through
``text_projection``) and the CoOp wrapper (``model/dim1/CLIP.py:13-75``:
learnable context vectors spliced between the SOT prefix and the token
suffix).  Only the text side is built — the reference loads the full
dual-encoder but never uses the vision tower (SURVEY.md §2.3).

TPU notes: attention is batched einsum on the MXU; LayerNorms run in fp32
regardless of compute dtype (mirroring the reference's fp16-safe LayerNorm,
``clip/model.py:153-158``).  ``convert_torch_clip_state_dict`` imports OpenAI
ViT-B/32 weights when a checkpoint is available.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activations import quick_gelu
from ..ops.masked import masked_softmax


@dataclass(frozen=True)
class CLIPTextConfig:
    """ViT-B/32 text tower hyperparameters (clip/model.py:395-432)."""
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512


class _CausalSelfAttention(nn.Module):
    """Self-attention with the CLIP in_proj/out_proj parameter layout.
    ``causal=False`` drops the mask (full attention) for the vision tower
    (clip/model.py:324-330: the causal mask is text-only)."""
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    causal: bool = True

    @nn.compact
    def __call__(self, x):
        b, n, _ = x.shape
        dh = self.width // self.heads
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return jnp.swapaxes(t.reshape(b, n, self.heads, dh), 1, 2)

        q, k, v = split(q), split(k), split(v)
        attn = (q @ jnp.swapaxes(k, -1, -2)) / jnp.sqrt(
            jnp.asarray(dh, q.dtype))
        if self.causal:
            causal = jnp.tril(jnp.ones((n, n), dtype=bool))
            attn = masked_softmax(attn, causal[None, None], axis=-1)
        else:
            attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.swapaxes(attn @ v, 1, 2).reshape(b, n, self.width)
        return nn.Dense(self.width, dtype=self.dtype, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    """ln_1 → MHA (causal for text) → +x; ln_2 → 4× MLP with QuickGELU →
    +x (clip/model.py:167-189)."""
    width: int = 512
    heads: int = 8
    dtype: jnp.dtype = jnp.float32
    causal: bool = True

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(name="ln_1", dtype=jnp.float32)(x)
        x = x + _CausalSelfAttention(self.width, self.heads, self.dtype,
                                     self.causal, name="attn")(y)
        y = nn.LayerNorm(name="ln_2", dtype=jnp.float32)(x)
        y = nn.Dense(4 * self.width, dtype=self.dtype, name="c_fc")(y)
        y = quick_gelu(y)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="c_proj")(y)
        return x


class CLIPTextEncoder(nn.Module):
    """Full text tower.  ``__call__`` embeds token ids and encodes;
    ``encode_embedding`` skips the lookup (CoOp splices its own embeddings).
    EOT pooling = row at argmax(token id) @ text_projection
    (clip/model.py:339-352).

    ``blocks_fn``: optional override running the resblock stack from its
    STACKED per-layer params — ``blocks_fn(stacked_params, x) -> x`` —
    used by pipeline parallelism (``parallel/pp.py``) to drive the same
    blocks GPipe-style over a 'pipe' mesh axis.  Param tree unchanged;
    init always takes the plain loop so every block materializes.
    """
    cfg: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32
    blocks_fn: object = None

    def setup(self):
        c = self.cfg
        self.token_embedding = nn.Embed(c.vocab_size, c.width,
                                        dtype=self.dtype,
                                        name="token_embedding")
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (c.context_length, c.width))
        self.blocks = [ResidualAttentionBlock(c.width, c.heads, self.dtype,
                                              name=f"resblock_{i}")
                       for i in range(c.layers)]
        self.ln_final = nn.LayerNorm(name="ln_final", dtype=jnp.float32)
        self.text_projection = self.param(
            "text_projection", nn.initializers.normal(c.width ** -0.5),
            (c.width, c.embed_dim))

    def embed(self, tokens):
        return self.token_embedding(tokens)

    def encode_embedding(self, x, eot_idx):
        """x: (B, T, width) token embeddings; eot_idx: (B,) EOT positions."""
        n = x.shape[1]
        x = x + self.positional_embedding[:n].astype(x.dtype)
        if self.blocks_fn is not None and not self.is_initializing():
            # pipeline-parallel stack (parallel/pp.py): hand the hook the
            # per-layer params stacked on a leading layer axis.  Reading
            # self.variables keeps gradients flowing into each block.
            stacked = jax.tree_util.tree_map(
                lambda *ls: jnp.stack(ls),
                *[self.variables["params"][f"resblock_{i}"]
                  for i in range(self.cfg.layers)])
            x = self.blocks_fn(stacked, x)
        else:
            for blk in self.blocks:
                x = blk(x)
        x = self.ln_final(x)
        pooled = jnp.take_along_axis(
            x, eot_idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        return pooled @ self.text_projection.astype(pooled.dtype)

    def __call__(self, tokens):
        """tokens: (B, T) int ids → (B, embed_dim)."""
        x = self.embed(tokens)
        eot = jnp.argmax(tokens, axis=-1)
        return self.encode_embedding(x, eot)


class CoOpClinicalEncoder(nn.Module):
    """CoOp-style clinical prompt encoder (model/dim1/CLIP.py:13-75).

    ``learnable=True``: a (n_prompts, n_ctx, width) learnable context is
    spliced as [SOT-prefix | ctx | suffix] into the (frozen) token embeddings
    before the text transformer; gradients flow only into the context (the
    embedding lookup is stop-gradiented, CLIP.py:31-33).
    ``learnable=False``: plain no-grad ``encode_text`` per prompt row.

    Input tokens: (B, P, T); output: (B, P, embed_dim).
    """
    n_prompts: int = 10          # len(clinical_features)+1 in the reference
    n_ctx: int = 8
    learnable: bool = True
    cfg: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32
    blocks_fn: object = None     # pipeline-parallel stack (parallel/pp.py)

    @nn.compact
    def __call__(self, tokens):
        b, p, t = tokens.shape
        clip_enc = CLIPTextEncoder(self.cfg, self.dtype, name="clip",
                                   blocks_fn=self.blocks_fn)
        flat = tokens.reshape(b * p, t)
        if not self.learnable:
            out = jax.lax.stop_gradient(clip_enc(flat))
            return out.reshape(b, p, -1)

        ctx = self.param("ctx", nn.initializers.normal(0.02),
                         (self.n_prompts, self.n_ctx, self.cfg.width))
        emb = jax.lax.stop_gradient(clip_enc.embed(flat))   # (BP, T, W)
        emb = emb.reshape(b, p, t, -1)
        # the ctx table has one row per 'devided' prompt; the 'single'
        # version renders fewer prompts — use the first P rows (the
        # reference's torch.cat would shape-error here, CLIP.py:44-51)
        ctx_b = jnp.broadcast_to(ctx[:p][None],
                                 (b, p, self.n_ctx,
                                  self.cfg.width)).astype(emb.dtype)
        spliced = jnp.concatenate(
            [emb[:, :, :1], ctx_b, emb[:, :, 1 + self.n_ctx:]], axis=2)
        eot = jnp.argmax(tokens, axis=-1).reshape(b * p)
        out = clip_enc.encode_embedding(
            spliced.reshape(b * p, t, -1), eot)
        return out.reshape(b, p, -1)


# ---------------------------------------------------------------------------
# Weight import from an OpenAI CLIP torch checkpoint (text side only).
# ---------------------------------------------------------------------------

def convert_torch_clip_state_dict(sd: dict, cfg: CLIPTextConfig
                                  = CLIPTextConfig()) -> dict:
    """Torch CLIP state_dict (fp16 or fp32 numpy-convertible values) → flax
    params for :class:`CLIPTextEncoder`.  Dense kernels transpose (out,in) →
    (in,out); the fused in_proj weight maps directly onto the qkv Dense."""

    def g(key):
        v = sd[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().float().numpy()
        return np.asarray(v, dtype=np.float32)

    params = {
        "token_embedding": {"embedding": g("token_embedding.weight")},
        "positional_embedding": g("positional_embedding"),
        "ln_final": {"scale": g("ln_final.weight"),
                     "bias": g("ln_final.bias")},
        "text_projection": g("text_projection"),
    }
    for i in range(cfg.layers):
        pre = f"transformer.resblocks.{i}."
        params[f"resblock_{i}"] = {
            "ln_1": {"scale": g(pre + "ln_1.weight"),
                     "bias": g(pre + "ln_1.bias")},
            "ln_2": {"scale": g(pre + "ln_2.weight"),
                     "bias": g(pre + "ln_2.bias")},
            "attn": {
                "in_proj": {"kernel": g(pre + "attn.in_proj_weight").T,
                            "bias": g(pre + "attn.in_proj_bias")},
                "out_proj": {"kernel": g(pre + "attn.out_proj.weight").T,
                             "bias": g(pre + "attn.out_proj.bias")},
            },
            "c_fc": {"kernel": g(pre + "mlp.c_fc.weight").T,
                     "bias": g(pre + "mlp.c_fc.bias")},
            "c_proj": {"kernel": g(pre + "mlp.c_proj.weight").T,
                       "bias": g(pre + "mlp.c_proj.bias")},
        }
    return params
