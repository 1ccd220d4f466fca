"""Transformer building blocks shared by the motion prior VAE, the latent
denoiser and the audio disentangler.

Functionally equivalent to the reference's DETR-style stack
(models/latent_diffusion/utils/cross_attention.py:18-382):

  * post-norm encoder/decoder layers (``normalize_before=False`` in every
    shipped config) with torch ``nn.MultiheadAttention`` semantics
    (packed-equivalent q/k/v projections + out projection, LayerNorm eps 1e-5),
  * U-Net-style "skip transformer" stacks: (L-1)/2 input blocks, a middle
    block, (L-1)/2 output blocks, each output block fed by
    ``Linear(concat(x, skip))`` (cross_attention.py:41-64),
  * additive learned 1-D positional embeddings, uniform[0,1) initialised
    (position_encoding.py:138-159).

Everything here is batch-first ``(B, T, D)`` (the reference's seq-first layout
is a torch implementation detail), shape-static, and dtype-polymorphic:
params live in float32, compute can run in bfloat16 on the MXU.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype

_TORCH_LN_EPS = 1e-5


def _activation(name: str) -> Callable[[jax.Array], jax.Array]:
    if name == "gelu":
        # torch F.gelu defaults to the EXACT erf form; flax nn.gelu defaults
        # to the tanh approximation - force exact for checkpoint parity.
        return lambda x: nn.gelu(x, approximate=False)
    if name == "relu":
        return nn.relu
    raise ValueError(f"unsupported activation: {name}")


class MultiHeadAttention(nn.Module):
    """Torch-compatible multi-head attention, batch-first.

    Keeps separate q/k/v kernels (the torch packed in_proj is split on
    import). ``attn_mask`` is an additive float mask or boolean keep-mask of
    shape broadcastable to (B, H, Tq, Tk).
    """

    d_model: int
    num_heads: int
    dtype: Dtype = jnp.float32
    # torch nn.MultiheadAttention(dropout=p) drops the ATTENTION WEIGHTS
    # during training (after softmax, before @ V) - a distinct regularizer
    # from the residual/FFN dropouts the layers apply around this module
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        key_padding_mask: Optional[jax.Array] = None,  # (B, Tk) True = keep
        deterministic: bool = True,
    ) -> jax.Array:
        d, h = self.d_model, self.num_heads
        head_dim = d // h
        dense = lambda name: nn.Dense(  # noqa: E731
            d, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = dense("q_proj")(query)
        k = dense("k_proj")(key)
        v = dense("v_proj")(value)

        def split(x):
            return x.reshape(x.shape[:-1] + (h, head_dim))

        q, k, v = split(q), split(k), split(v)
        # NOTE: no fused-kernel path here by measurement - at the VAE shape
        # (B 32, H 4, S 302, hd 64) the Pallas kernel LOSES to XLA's einsum
        # attention (52.6 vs 47.6 ms LPDM step: 302->384 pad waste dominates).
        # The kernel pays off from ~512 tokens; the AST (S 1214) opts in via
        # ASTConfig.flash_attention instead.
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(head_dim, self.dtype)
        )
        if key_padding_mask is not None:
            neg = jnp.asarray(jnp.finfo(jnp.float32).min, scores.dtype)
            scores = jnp.where(key_padding_mask[:, None, None, :], scores, neg)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(out.shape[:-2] + (d,))
        return dense("out_proj")(out)


class FeedForward(nn.Module):
    d_model: int
    ff_size: int
    activation: str = "gelu"
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        act = _activation(self.activation)
        h = nn.Dense(self.ff_size, dtype=self.dtype, param_dtype=jnp.float32, name="linear1")(x)
        h = act(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name="linear2")(h)


class EncoderLayer(nn.Module):
    """Post-norm (default) or pre-norm transformer encoder layer."""

    d_model: int
    num_heads: int
    ff_size: int
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        key_padding_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        attn = MultiHeadAttention(
            self.d_model, self.num_heads, self.dtype, self.dropout, name="self_attn"
        )
        ffn = FeedForward(
            self.d_model, self.ff_size, self.activation, self.dropout, self.dtype, name="ffn"
        )
        norm1 = nn.LayerNorm(epsilon=_TORCH_LN_EPS, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=_TORCH_LN_EPS, dtype=self.dtype, name="norm2")
        drop = lambda y: nn.Dropout(self.dropout)(y, deterministic=deterministic)  # noqa: E731

        if self.normalize_before:
            h = norm1(x)
            x = x + drop(attn(h, h, h, key_padding_mask, deterministic))
            h = norm2(x)
            return x + drop(ffn(h, deterministic))
        x = norm1(x + drop(attn(x, x, x, key_padding_mask, deterministic)))
        return norm2(x + drop(ffn(x, deterministic)))


class DecoderLayer(nn.Module):
    """Post/pre-norm decoder layer: self-attn -> cross-attn -> FFN."""

    d_model: int
    num_heads: int
    ff_size: int
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jax.Array,
        memory: jax.Array,
        tgt_key_padding_mask: Optional[jax.Array] = None,
        memory_key_padding_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        self_attn = MultiHeadAttention(
            self.d_model, self.num_heads, self.dtype, self.dropout, name="self_attn"
        )
        cross_attn = MultiHeadAttention(
            self.d_model, self.num_heads, self.dtype, self.dropout, name="cross_attn"
        )
        ffn = FeedForward(
            self.d_model, self.ff_size, self.activation, self.dropout, self.dtype, name="ffn"
        )
        norm1 = nn.LayerNorm(epsilon=_TORCH_LN_EPS, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=_TORCH_LN_EPS, dtype=self.dtype, name="norm2")
        norm3 = nn.LayerNorm(epsilon=_TORCH_LN_EPS, dtype=self.dtype, name="norm3")
        drop = lambda y: nn.Dropout(self.dropout)(y, deterministic=deterministic)  # noqa: E731

        if self.normalize_before:
            h = norm1(tgt)
            tgt = tgt + drop(self_attn(h, h, h, tgt_key_padding_mask, deterministic))
            h = norm2(tgt)
            tgt = tgt + drop(cross_attn(h, memory, memory, memory_key_padding_mask, deterministic))
            h = norm3(tgt)
            return tgt + drop(ffn(h, deterministic))
        tgt = norm1(tgt + drop(self_attn(tgt, tgt, tgt, tgt_key_padding_mask, deterministic)))
        tgt = norm2(
            tgt + drop(cross_attn(tgt, memory, memory, memory_key_padding_mask, deterministic))
        )
        return norm3(tgt + drop(ffn(tgt, deterministic)))


class SkipEncoder(nn.Module):
    """U-Net skip transformer encoder (cross_attention.py:18-64).

    num_layers must be odd: (L-1)/2 down blocks, one middle block, (L-1)/2 up
    blocks with Linear(2D -> D) skip merges, then a final LayerNorm.
    """

    d_model: int
    num_heads: int
    ff_size: int
    num_layers: int = 9
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        key_padding_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        assert self.num_layers % 2 == 1, "skip encoder needs an odd layer count"
        n_block = (self.num_layers - 1) // 2
        layer = lambda name: EncoderLayer(  # noqa: E731
            self.d_model, self.num_heads, self.ff_size, self.dropout,
            self.activation, self.normalize_before, self.dtype, name=name,
        )
        skips = []
        for i in range(n_block):
            x = layer(f"in_{i}")(x, key_padding_mask, deterministic)
            skips.append(x)
        x = layer("mid")(x, key_padding_mask, deterministic)
        for i in range(n_block):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = nn.Dense(
                self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name=f"skip_{i}"
            )(x)
            x = layer(f"out_{i}")(x, key_padding_mask, deterministic)
        return nn.LayerNorm(epsilon=_TORCH_LN_EPS, dtype=self.dtype, name="norm")(x)


class SkipDecoder(nn.Module):
    """U-Net skip transformer decoder (cross_attention.py:66-125)."""

    d_model: int
    num_heads: int
    ff_size: int
    num_layers: int = 9
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jax.Array,
        memory: jax.Array,
        tgt_key_padding_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        assert self.num_layers % 2 == 1, "skip decoder needs an odd layer count"
        n_block = (self.num_layers - 1) // 2
        layer = lambda name: DecoderLayer(  # noqa: E731
            self.d_model, self.num_heads, self.ff_size, self.dropout,
            self.activation, self.normalize_before, self.dtype, name=name,
        )
        skips = []
        x = tgt
        for i in range(n_block):
            x = layer(f"in_{i}")(x, memory, tgt_key_padding_mask, None, deterministic)
            skips.append(x)
        x = layer("mid")(x, memory, tgt_key_padding_mask, None, deterministic)
        for i in range(n_block):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = nn.Dense(
                self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name=f"skip_{i}"
            )(x)
            x = layer(f"out_{i}")(x, memory, tgt_key_padding_mask, None, deterministic)
        return nn.LayerNorm(epsilon=_TORCH_LN_EPS, dtype=self.dtype, name="norm")(x)


class LearnedPositionalEmbedding(nn.Module):
    """Additive learned 1-D positional embedding (position_encoding.py:138-159).

    Parameter shape (max_len, d_model), uniform[0, 1) initialised exactly like
    the reference's ``nn.init.uniform_``; added to the leading T positions.
    """

    d_model: int
    max_len: int = 500

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pe = self.param(
            "pe",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32),
            (self.max_len, self.d_model),
        )
        t = x.shape[-2]
        return x + pe[None, :t, :].astype(x.dtype)


def lengths_to_mask(lengths: Optional[jax.Array], batch: int, max_len: int) -> Optional[jax.Array]:
    """(B,) lengths -> (B, T) boolean keep-mask; None -> None (full attention).

    Mirrors temos_utils.lengths_to_mask; in every shipped path the lengths are
    all equal to the window size, so None short-circuits the masking entirely.
    """
    if lengths is None:
        return None
    return jnp.arange(max_len)[None, :] < lengths[:, None]
