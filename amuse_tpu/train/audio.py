"""Stage-1 training: the AST speech disentangler swap objective.

Re-design of trainer.train_dtw_ast (scripts/trainer.py:188-333) +
AST_EVP.forward (models/audio/AST_EVP.py:118-168). Per step the reference
runs 16 sequential ``reconstruct`` calls (12 ViT forwards + 16 fusion/
decoder passes) on a batch of (actor1, actor2) x (take1, take2) fbank quads.

TPU-first restructuring (same math):
  * the 4 quad members stack into one (4B, 1024, 128) "virtual batch";
    each of the 3 AST encoders runs ONCE over it (3 ViT forwards instead
    of 12 sequential calls),
  * the 16 reconstruction feature combinations are gathered into a
    (16, B, 768) tensor and go through fusion+decoder in ONE batched call
    (group axis = the reference's per-call boundary, preserving the
    batch-as-sequence attention quirk),
  * bf16 matmuls with f32 params replace the reference's AMP + GradScaler
    (trainer.py:238-247) - bf16 needs no loss scaling,
  * batch shards over the mesh "data" axis, replacing nn.DataParallel
    (trainer.py:203-206) with XLA-collective data parallelism.

Optimizer parity (configs/base_new.json:124-134, trainer.py:126-132):
Adam(lr 1e-5, betas (0.95, 0.999), L2 weight decay 5e-7) with MultiStepLR
gamma 0.85 from epoch 5, step 1.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from amuse_tpu.models.ast import ASTConfig, ASTDisentangler
from amuse_tpu.train import fused_adam
from amuse_tpu.train import losses as L
from amuse_tpu.train import prng


@dataclass(frozen=True)
class AudioTrainConfig:
    learning_rate: float = 1e-5
    beta1: float = 0.95
    beta2: float = 0.999
    weight_decay: float = 5e-7  # torch Adam style: L2 term added to grads
    lr_decay_start_epoch: int = 5
    lr_decay_gamma: float = 0.85
    epochs: int = 25
    frame_based_feats: bool = True  # configs/base_new.json:145
    # SpecAugment (train-time, dm/dataload.py:222-248)
    freq_mask: int = 24
    time_mask: int = 96
    noise_aug: bool = True


def lr_schedule(cfg: AudioTrainConfig, epoch: int) -> float:
    """MultiStepLR(milestones=range(start, epochs), gamma) at epoch granularity."""
    decays = max(0, epoch - cfg.lr_decay_start_epoch + 1)
    return cfg.learning_rate * (cfg.lr_decay_gamma**decays)


def make_optimizer(cfg: AudioTrainConfig) -> fused_adam.FusedAdam:
    # torch Adam(weight_decay=) adds wd * param to the raw gradient (L2),
    # unlike decoupled AdamW - order matters: decay BEFORE the Adam moment
    # updates. One-pass fused update (train/fused_adam.py): identical math
    # to the optax add_decayed_weights->scale_by_adam->scale chain this
    # replaces (tests/test_fused_adam.py pins both that and live
    # torch.optim.Adam), minus the intermediate update-tree HBM traffic
    # (benchmarks/optimizer_update.py measures both on the real 424.7M-param
    # tree). The lr lives in the state (FusedAdamState.lr) for the schedule.
    return fused_adam.make_fused_adam(
        b1=cfg.beta1, b2=cfg.beta2, weight_decay=cfg.weight_decay, mode="l2"
    )


class AudioTrainState(NamedTuple):
    params: dict
    opt_state: fused_adam.FusedAdamState
    step: jax.Array


def init_state(
    rng: jax.Array,
    cfg: AudioTrainConfig = AudioTrainConfig(),
    dtype=jnp.bfloat16,
    ast_cfg: ASTConfig = ASTConfig(),
) -> AudioTrainState:
    model = ASTDisentangler(dtype=dtype, base_cfg=ast_cfg)
    # init must trace the SAME frame_based_feats branch the train step uses:
    # each branch creates a different label-head param set, and flax raises
    # ScopeParamNotFoundError at step time on a mismatch. Jitted: eager
    # flax init dispatches per-primitive, which is pathological through a
    # remote-compile tunnel (see infer/pipeline.py::init_random_params).
    params = jax.jit(
        lambda r, x: model.init(r, x, cfg.frame_based_feats)
    )(rng, jnp.zeros((1, ast_cfg.input_tdim, ast_cfg.input_fdim)))["params"]
    opt_state = make_optimizer(cfg).init(params, cfg.learning_rate)
    return AudioTrainState(params, opt_state, jnp.zeros((), jnp.int32))


def spec_augment(
    rng: jax.Array, fbank: jax.Array, freq_mask: int, time_mask: int, noise: bool
) -> tuple[jax.Array, jax.Array]:
    """Train-time augmentation -> ``(target, model_input)``.

    Reference semantics (dm/dataload.py:222-248 + AST_EVP.py:125-126,160):
    SpecAugment masks + normalisation are applied to the BASE fbank, which
    is both the recon TARGET and the base of the ``_noisy`` model input;
    the noisy copy additionally gets uniform noise scaled by a per-sample
    random amplitude (``torch.rand(shape) * np.random.rand() / 10``) and a
    roll drawn from randint(-10, 10) - i.e. [-10, 10). With noise on, the
    model encodes the noisy copy but reconstructs the masked-only fbank.

    Static-shaped: masks are realised with iota comparisons, the roll with
    jnp.roll on a traced shift - all jit/vmap safe.
    """
    # independent keys per draw: mask start and width must be uncorrelated
    # (torchaudio draws them independently; sharing a key ties them)
    kf0, kfw, kt0, ktw, kn, ka, kr = jax.random.split(rng, 7)
    t_len, f_len = fbank.shape[-2], fbank.shape[-1]

    # torchaudio draws the start AFTER the width, uniform on
    # [0, len - width]: drawing it from [0, len - max_width) instead would
    # systematically under-mask the last max_width rows. jit-safe via a
    # uniform float scaled by the (traced) width-dependent range.
    def start_index(key, length, width):
        u = jax.random.uniform(key, ())
        return jnp.floor(u * (length - width + 1)).astype(jnp.int32)

    # torchaudio mask_along_axis: width = (rand()*mask_param).long(), i.e.
    # uniform over {0..mask_param-1} - mask_param itself is NOT reachable
    fw = jax.random.randint(kfw, (), 0, jnp.maximum(freq_mask, 1))
    f0 = start_index(kf0, f_len, fw)
    f_idx = jnp.arange(f_len)
    fbank = jnp.where((f_idx >= f0) & (f_idx < f0 + fw), 0.0, fbank)

    tw = jax.random.randint(ktw, (), 0, jnp.maximum(time_mask, 1))
    t0 = start_index(kt0, t_len, tw)
    t_idx = jnp.arange(t_len)[:, None]
    fbank = jnp.where((t_idx >= t0) & (t_idx < t0 + tw), 0.0, fbank)

    if not noise:
        return fbank, fbank
    amp = jax.random.uniform(ka, (), fbank.dtype)  # np.random.rand() scalar
    noisy = fbank + jax.random.uniform(kn, fbank.shape, fbank.dtype) * amp / 10.0
    shift = jax.random.randint(kr, (), -10, 10)  # randint(-10, 10): 10 excl.
    return fbank, jnp.roll(noisy, shift, axis=-2)


def make_train_step(
    cfg: AudioTrainConfig = AudioTrainConfig(),
    dtype=jnp.bfloat16,
    ast_cfg: ASTConfig = ASTConfig(),
):
    """Build the jitted stage-1 step.

    batch dict (leading dim B, sharded over the data axis):
      fbanks (B, 4, 1024, 128) clean normalised quads [a1t1, a1t2, a2t1, a2t2]
      emo_id (B,), a1_id (B,), a2_id (B,)   0-based label indices
    """
    model = ASTDisentangler(dtype=dtype, base_cfg=ast_cfg)
    optimizer = make_optimizer(cfg)

    def loss_fn(params, batch, rng):
        clean = batch["fbanks"]  # (B, 4, T, F)
        b = clean.shape[0]
        quad = jnp.swapaxes(clean, 0, 1)  # (4, B, T, F)
        rng, r_drop = jax.random.split(rng)
        # dropout masks on the TPU hardware RNG stream (train/prng.py);
        # SpecAugment geometry stays threefry (its draw sequence is pinned
        # against the torchaudio reconstruction)
        r_drop1, r_drop2 = jax.random.split(prng.dropout_key(r_drop))

        if cfg.noise_aug or cfg.freq_mask or cfg.time_mask:
            keys = jax.random.split(rng, 4 * b)
            # keep any trailing key-data dims: legacy uint32 PRNGKeys are
            # (4b, 2) here while typed keys are (4b,) - a bare
            # reshape(4, b) crashed on the legacy flavor
            rngs = keys.reshape((4, b) + keys.shape[1:])
            # target = masked fbank; model input = masked + noise + roll
            # (the reference reconstructs the masked-only fbank from the
            # noisy copy, AST_EVP.py:125-126,160)
            target, aug = jax.vmap(jax.vmap(
                lambda r, x: spec_augment(r, x, cfg.freq_mask, cfg.time_mask, cfg.noise_aug)
            ))(rngs, quad)
        else:
            target = aug = quad

        flat = aug.reshape(4 * b, *aug.shape[2:])  # one virtual batch
        enc = model.apply(
            {"params": params}, flat, cfg.frame_based_feats, False,
            method="encode", rngs={"dropout": r_drop1},
        )
        f_emo = enc["emo"]["feature"].reshape(4, b, -1)
        f_sty = enc["sty"]["feature"].reshape(4, b, -1)
        f_con = enc["con"]["feature"].reshape(4, b, -1)
        emo_logits = enc["emo"]["logits"].reshape(4, b, -1)
        sty_logits = enc["sty"]["logits"].reshape(4, b, -1)

        # 16 feature combinations (AST_EVP.py:133-157):
        #   self x4:        (emo_i,  sty_i,  con_i)
        #   content swap:   (emo_i,  sty_i,  con_partner(i))  partner: a1t1<->a2t1 etc.
        #   emotion swap:   (emo_other_take(i), sty_i, con_i)
        #   style swap:     (emo_i,  sty_other_take(i), con_i)
        partner = jnp.asarray([2, 3, 0, 1])  # same take, other actor
        other_take = jnp.asarray([1, 0, 3, 2])  # same actor, other take
        ident = jnp.arange(4)

        def combos(emo_idx, sty_idx, con_idx):
            return jnp.concatenate(
                [f_emo[emo_idx], f_sty[sty_idx], f_con[con_idx]], axis=-1
            )  # (4, B, 768)

        groups = jnp.concatenate(
            [
                combos(ident, ident, ident),
                combos(ident, ident, partner),
                combos(other_take, ident, ident),
                combos(ident, other_take, ident),
            ],
            axis=0,
        )  # (16, B, 768)
        recons = model.apply(
            {"params": params}, groups, False,
            method="reconstruct", rngs={"dropout": r_drop2},
        )  # (16, B, 1024, 128)

        return L.ast_swap_losses(
            recons, target, emo_logits, sty_logits, f_con,
            batch["emo_id"], batch["a1_id"], batch["a2_id"],
        )

    @jax.jit
    def train_step(state: AudioTrainState, batch: dict, rng: jax.Array):
        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        params, opt_state = optimizer.apply(state.opt_state, state.params, grads)
        return AudioTrainState(params, opt_state, state.step + 1), logs

    def set_lr(state: AudioTrainState, epoch: int) -> AudioTrainState:
        """Apply the MultiStepLR schedule to the in-state learning rate."""
        opt_state = state.opt_state._replace(
            lr=jnp.asarray(lr_schedule(cfg, epoch), jnp.float32)
        )
        return state._replace(opt_state=opt_state)

    return train_step, set_lr
