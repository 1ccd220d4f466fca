"""Legacy "diffusion"-tag model family: the CaMN/MDM-era members.

Completes the legacy zoo around models/raw_diffusion.py's core denoiser
(reference: models/diffusion/bvh_fac/bvh_fac_models.py PoseMDM "lstm" and
"trans_face_dec" arches, text/txt_models.py + txt_util.py, face/fac_util.py,
audio/wav_models.py, utils/fusion_addon.py, discriminator/discriminator.py).
This family is unreachable from the reference's 6 CLI tasks (its tag list is
scripts/main.py:61) and is kept for model-zoo parity; the flagship path is
the latent LPDM.

TPU-first notes: conv1d stacks run as NHWC convs XLA tiles onto the MXU;
the LSTM is ``nn.RNN`` (lax.scan under jit - no Python-loop unrolling);
BatchNorm state is explicit flax ``batch_stats``. The GPT-2 text backbone
uses transformers' FlaxGPT2Module (JAX-native) frozen, exactly as the
reference freezes torch GPT2Model (txt_models.py:36-39).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


# ------------------------------------------------------------- text (GPT-2)


class TextEncoder(nn.Module):
    """Frozen GPT-2 last_hidden_state -> projected text latents.

    Reference TxtNet (txt_models.py:13-89): tokenizes the TextGrid window's
    words, runs a frozen GPT2Model, projects 768 -> latent_dim with an
    optional ReLU. Tokenization + TextGrid slicing are host-side concerns
    (amuse_tpu.data text utilities); this module takes token ids.
    """

    latent_dim: int = 256
    nonlinear: bool = True
    gpt2_config: Optional[object] = None  # transformers.GPT2Config; tiny default

    def setup(self):
        from transformers import GPT2Config
        from transformers.models.gpt2.modeling_flax_gpt2 import FlaxGPT2Module

        cfg = self.gpt2_config or GPT2Config(
            n_embd=64, n_layer=2, n_head=2, vocab_size=50257
        )
        self.backbone = FlaxGPT2Module(cfg, dtype=jnp.float32)
        self.proj = nn.Dense(self.latent_dim)

    def __call__(self, input_ids: jax.Array, attention_mask: Optional[jax.Array] = None):
        """(B, L) token ids -> (B, L, latent_dim)."""
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        position_ids = jnp.cumsum(attention_mask, axis=-1) - 1
        hidden = self.backbone(
            input_ids, attention_mask, position_ids.astype(jnp.int32),
            deterministic=True,
        )[0]
        # frozen backbone (reference freezes GPT-2, txt_models.py:37-39)
        hidden = jax.lax.stop_gradient(hidden)
        if self.nonlinear:
            hidden = nn.relu(hidden)
        return self.proj(hidden)


# -------------------------------------------------------- TCN (txt_util.py)


class TemporalBlock(nn.Module):
    """Causal dilated conv block (txt_util.py TemporalBlock): two chomped
    convs + LeakyReLU-free ReLU + residual 1x1 when channels change."""

    channels: int
    kernel: int = 3
    dilation: int = 1
    dropout: float = 0.25

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        # x: (B, T, C); causal padding = (k-1)*d on the left only
        pad = (self.kernel - 1) * self.dilation
        h = x
        for i in range(2):
            h = jnp.pad(h, ((0, 0), (pad, 0), (0, 0)))
            h = nn.Conv(
                self.channels, (self.kernel,), kernel_dilation=(self.dilation,),
                padding="VALID", name=f"conv{i + 1}",
            )(h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        res = x if x.shape[-1] == self.channels else nn.Conv(
            self.channels, (1,), name="downsample"
        )(x)
        return nn.relu(h + res)


class TemporalConvNet(nn.Module):
    """Stack of TemporalBlocks with doubling dilation (txt_util.py:78-93)."""

    num_channels: Sequence[int]
    kernel: int = 3
    dropout: float = 0.25

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        for i, c in enumerate(self.num_channels):
            x = TemporalBlock(
                c, self.kernel, dilation=2 ** i, dropout=self.dropout,
                name=f"block_{i}",
            )(x, deterministic)
        return x


# ----------------------------------------------------- face (fac_util.py)


class ConvBasicBlock(nn.Module):
    """CaMN/TIMM-style residual conv1d block (fac_util.py BasicBlock):
    conv-BN-LeakyReLU x2 + (optional conv-BN) shortcut."""

    channels: int
    kernel: int = 3
    first_dilation: int = 1  # used as the first conv's padding upstream
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, name=name
        )
        h = nn.Conv(
            self.channels, (self.kernel,),
            padding=[(self.first_dilation, self.first_dilation)], name="conv1",
        )(x)
        h = nn.leaky_relu(norm("bn1")(h), 0.01)
        h = nn.Conv(
            self.channels, (self.kernel,),
            padding=[(self.kernel // 2, self.kernel // 2)], name="conv2",
        )(h)
        h = norm("bn2")(h)
        if self.downsample:
            identity = nn.Conv(
                self.channels, (self.kernel,),
                padding=[(self.first_dilation, self.first_dilation)], name="down_conv",
            )(x)
            identity = norm("down_bn")(identity)
        else:
            identity = x
        return nn.leaky_relu(h + identity, 0.01)


class FaceNet(nn.Module):
    """Facial-coefficient encoder (fac_util.py FaceNet): 4 residual conv1d
    blocks, 7-3-3-3 kernels, channels in -> latent/2 -> latent."""

    latent_dim: int = 256

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: (B, T, n_face_feats)
        half = self.latent_dim // 2
        x = ConvBasicBlock(half, 7, first_dilation=3, downsample=True, name="b0")(x, train)
        x = ConvBasicBlock(half, 3, first_dilation=1, downsample=True, name="b1")(x, train)
        x = ConvBasicBlock(half, 3, first_dilation=1, name="b2")(x, train)
        x = ConvBasicBlock(self.latent_dim, 3, first_dilation=1, downsample=True, name="b3")(x, train)
        return x


# --------------------------------------------------- audio (wav_models.py)


class AudioNet(nn.Module):
    """Audio conditioning stream (wav_models.py AudioNet): disentangled
    features -> (ReLU+)Linear projection; combined raw features -> TCN then
    projection."""

    latent_dim: int = 256
    nonlinear: bool = True
    disentangled: bool = True
    tcn_channels: Sequence[int] = (300,)

    @nn.compact
    def __call__(self, feats: jax.Array, deterministic: bool = True) -> jax.Array:
        if not self.disentangled:
            # (B, T, C) combined features through the causal TCN
            feats = TemporalConvNet(self.tcn_channels, name="tcn")(feats, deterministic)
        if self.nonlinear:
            feats = nn.relu(feats)
        return nn.Dense(self.latent_dim, name="proj")(feats)


# --------------------------------------- fusion + addons (fusion_addon.py)


class FusionNet(nn.Module):
    """CaMN fusion MLP (fusion_addon.py:14-19): Linear-LeakyReLU x2."""

    latent_dim: int = 256

    @nn.compact
    def __call__(self, concat_feats: jax.Array) -> jax.Array:
        h = nn.leaky_relu(nn.Dense(self.latent_dim, name="fc1")(concat_feats), 0.01)
        return nn.leaky_relu(nn.Dense(self.latent_dim, name="fc2")(h), 0.01)


class EmotionAddon(nn.Module):
    """Emotion id -> per-frame embedding + conv tail (fusion_addon.py:41-61)."""

    latent_dim: int = 256
    count: int = 8

    @nn.compact
    def __call__(self, emo_ids: jax.Array, train: bool = False) -> jax.Array:
        # emo_ids: (B, T) int -> (B, T, latent)
        h = nn.Embed(self.count, self.latent_dim, name="embed")(emo_ids)
        h = nn.Dense(self.latent_dim, name="fc")(h)
        widths = (8, 16, 16, self.latent_dim)
        for i, c in enumerate(widths):
            h = nn.Conv(c, (9,), padding=[(4, 4)], name=f"conv{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"bn{i}")(h)
            h = nn.leaky_relu(h, 0.3)
        return h


class SpeakerAddon(nn.Module):
    """Speaker id -> embedding (fusion_addon.py:63-69)."""

    latent_dim: int = 256
    count: int = 30

    @nn.compact
    def __call__(self, speaker_ids: jax.Array) -> jax.Array:
        h = nn.Embed(self.count, self.latent_dim, name="embed")(speaker_ids)
        return nn.leaky_relu(nn.Dense(self.latent_dim, name="fc")(h), 0.01)


# ------------------------------------------- CaMN generator ("lstm" arch)


@dataclass(frozen=True)
class CaMNConfig:
    nfeats: int = 168       # pose vector per frame (or n_face_feats)
    latent_dim: int = 256   # LSTM hidden
    fusion_dim: int = 256
    num_layers: int = 4
    dropout: float = 0.1


class CaMNPoseGenerator(nn.Module):
    """The CaMN-style fusion LSTM generator (PoseMDM arch=="lstm", pose
    modality, bvh_fac_models.py:97-155): conditioning streams are fused,
    concatenated with the pose features per frame, run through a stacked
    LSTM and a Linear-LeakyReLU-Linear head back to pose space.
    """

    cfg: CaMNConfig = CaMNConfig()

    @nn.compact
    def __call__(
        self,
        pose: jax.Array,                # (B, T, nfeats)
        audio: jax.Array,               # (B, T, A) conditioning stream
        emo_ids: Optional[jax.Array] = None,      # (B, T) int
        speaker_ids: Optional[jax.Array] = None,  # (B, T) int
        text: Optional[jax.Array] = None,         # (B, T, Dtxt)
        train: bool = False,
    ) -> jax.Array:
        cfg = self.cfg
        streams = [AudioNet(cfg.fusion_dim, name="audio_net")(audio)]
        if text is not None:
            streams.append(nn.Dense(cfg.fusion_dim, name="txt_proj")(text))
        if emo_ids is not None:
            streams.append(EmotionAddon(cfg.fusion_dim, name="emo_addon")(emo_ids, train))
        if speaker_ids is not None:
            streams.append(SpeakerAddon(cfg.fusion_dim, name="spk_addon")(speaker_ids))
        fused = FusionNet(cfg.fusion_dim, name="fusion")(
            jnp.concatenate(streams, axis=-1)
        )
        h = jnp.concatenate([fused, pose], axis=-1)
        for i in range(cfg.num_layers):
            h = nn.RNN(nn.OptimizedLSTMCell(cfg.latent_dim), name=f"lstm_{i}")(h)
        h = nn.leaky_relu(nn.Dense(cfg.latent_dim // 2, name="head1")(h), 0.01)
        return nn.Dense(cfg.nfeats, name="head2")(h)


# --------------------------------- faceformer decoder ("trans_face_dec")


def periodic_positional_encoding(t: int, d: int, period: int = 25) -> jnp.ndarray:
    """Faceformer PPE (faceformer_utils.py): the sinusoid repeats with
    ``period`` so the decoder generalises over long sequences."""
    import numpy as np

    pos = np.arange(t) % period
    i = np.arange(0, d, 2)
    angles = pos[:, None] / np.power(10000.0, i[None, :] / d)
    pe = np.zeros((t, d), np.float32)
    pe[:, 0::2] = np.sin(angles)
    pe[:, 1::2] = np.cos(angles)[:, : pe[:, 1::2].shape[1]]
    return jnp.asarray(pe)


def biased_causal_mask(t: int, period: int = 25) -> jnp.ndarray:
    """ALiBi-style biased causal mask (faceformer_utils.py init_biased_mask,
    single-head slope simplification): additive bias favouring recent
    frames, -inf above the diagonal."""
    import numpy as np

    bias = -np.abs(np.arange(t)[:, None] // period - np.arange(t)[None, :] // period)
    mask = np.triu(np.full((t, t), -np.inf, np.float32), k=1)
    return jnp.asarray(bias + mask)


class FaceformerDecoder(nn.Module):
    """Autoregressive facial decoder (PoseMDM modality=="face",
    arch=="trans_face_dec", bvh_fac_models.py:215-243): audio memory +
    speaker/emotion style vectors, periodic PE, biased causal self-attention,
    zero-initialised output map (vertice_map_r, :242-243).

    TPU re-design: teacher-forced parallel decode of the whole window (one
    masked attention pass) instead of the reference's per-frame python loop -
    identical math under teacher forcing, one kernel launch.
    """

    n_face_feats: int = 100
    latent_dim: int = 128
    num_heads: int = 4
    ff_size: int = 512
    num_layers: int = 2
    num_speakers: int = 30
    num_emotions: int = 8
    period: int = 25

    @nn.compact
    def __call__(
        self,
        face: jax.Array,          # (B, T, n_face_feats) teacher-forcing input
        audio_memory: jax.Array,  # (B, T, A)
        speaker_ids: jax.Array,   # (B,) int
        emo_ids: Optional[jax.Array] = None,  # (B,) int
    ) -> jax.Array:
        b, t, _ = face.shape
        mem = nn.Dense(self.latent_dim, name="audio_feature_map")(audio_memory)
        style = nn.Embed(self.num_speakers, self.latent_dim, name="obj_vector")(speaker_ids)
        if emo_ids is not None:
            style = style + nn.Embed(self.num_emotions, self.latent_dim, name="emo_vector")(emo_ids)
        # teacher forcing feeds the RIGHT-SHIFTED targets (zero start token,
        # bvh_fac_models.py:447-449 ``cat((start_token, face[:, :-1]), 1)``):
        # position t must see only frames < t, else the causal diagonal leaks
        # the very frame being predicted and training collapses to identity.
        shifted = jnp.concatenate(
            [jnp.zeros_like(face[:, :1]), face[:, :-1]], axis=1
        )
        h = nn.Dense(self.latent_dim, name="vertice_map")(shifted) + style[:, None, :]
        h = h + periodic_positional_encoding(t, self.latent_dim, self.period)

        bias = biased_causal_mask(t, self.period)  # (T, T) additive
        hd = self.latent_dim // self.num_heads
        for i in range(self.num_layers):
            # biased causal self-attention: softmax(qk/sqrt(d) + bias)
            x = nn.LayerNorm(name=f"ln1_{i}")(h)
            qkv = nn.Dense(3 * self.latent_dim, name=f"self_qkv_{i}")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            split = lambda a: a.reshape(b, t, self.num_heads, hd)  # noqa: E731
            logits = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k)) / jnp.sqrt(
                jnp.asarray(hd, jnp.float32)
            )
            attn = jax.nn.softmax(logits + bias[None, None], axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", attn, split(v)).reshape(b, t, -1)
            h = h + nn.Dense(self.latent_dim, name=f"self_proj_{i}")(o)

            cross = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, name=f"cross_attn_{i}",
            )(nn.LayerNorm(name=f"ln2_{i}")(h), mem, deterministic=True)
            h = h + cross
            ff = nn.Dense(self.ff_size, name=f"ff1_{i}")(nn.LayerNorm(name=f"ln3_{i}")(h))
            h = h + nn.Dense(self.latent_dim, name=f"ff2_{i}")(nn.gelu(ff))
        return nn.Dense(
            self.n_face_feats, name="vertice_map_r",
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(h)


# ------------------------------------------------------------ discriminator


class ConvDiscriminator(nn.Module):
    """Sequence discriminator. NOTE: the reference's ConvDiscriminator is an
    EMPTY module (discriminator/discriminator.py:1-7 - bare __init__, no
    layers, no forward) that is constructed but never trained. This is a
    working minimal implementation of the CaMN-style conv discriminator the
    empty class stood for; round-1 PARITY.md overclaimed this as done.
    """

    channels: Sequence[int] = (64, 128)

    @nn.compact
    def __call__(self, pose_seq: jax.Array) -> jax.Array:
        """(B, T, F) -> (B,) real/fake logit."""
        h = pose_seq
        for i, c in enumerate(self.channels):
            h = nn.Conv(c, (4,), strides=(2,), name=f"conv{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Dense(1, name="out")(h.mean(axis=1))[:, 0]
