"""Stage-1 classification statistics (accuracy / precision / recall / F1).

Re-provides AST_EVP.calculate_stats (models/audio/AST_EVP.py:331-430, which
leans on torchmetrics) as pure-JAX confusion-matrix math, batched over the
epoch's collected logits. Macro averaging matches torchmetrics
Precision/Recall(average='macro') and F1Score(micro default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def confusion_matrix(preds: jax.Array, labels: jax.Array, num_classes: int) -> jax.Array:
    """(N,) int preds/labels -> (C, C) counts [true, pred]."""
    idx = labels * num_classes + preds
    flat = jnp.zeros(num_classes * num_classes, jnp.int32).at[idx].add(1)
    return flat.reshape(num_classes, num_classes)


def classification_stats(
    logits: jax.Array, labels: jax.Array, num_classes: int
) -> dict[str, jax.Array]:
    """-> {acc (percent), precision_macro, recall_macro, f1_micro}."""
    preds = jnp.argmax(logits, axis=-1)
    cm = confusion_matrix(preds, labels, num_classes).astype(jnp.float32)
    tp = jnp.diagonal(cm)
    per_pred = jnp.sum(cm, axis=0)  # predicted counts per class
    per_true = jnp.sum(cm, axis=1)  # true counts per class
    precision = jnp.where(per_pred > 0, tp / jnp.maximum(per_pred, 1), 0.0)
    recall = jnp.where(per_true > 0, tp / jnp.maximum(per_true, 1), 0.0)
    total = jnp.sum(cm)
    acc = jnp.sum(tp) / jnp.maximum(total, 1)
    return {
        "acc": 100.0 * acc,
        "precision_macro": jnp.mean(precision),
        "recall_macro": jnp.mean(recall),
        # micro-F1 over all classes == accuracy for single-label problems
        # (torchmetrics F1Score default), reported for parity
        "f1_micro": acc,
    }


def epoch_stats(
    emo_logits: jax.Array,  # (N, 8) collected over the epoch (all 4 quad slots)
    emo_labels: jax.Array,
    sty_logits: jax.Array,  # (N, 30)
    sty_labels: jax.Array,
) -> dict[str, dict[str, float]]:
    """The reference's end-of-epoch stats dict {emo_stats, subject_stats}."""
    emo = classification_stats(emo_logits, emo_labels, 8)
    sty = classification_stats(sty_logits, sty_labels, 30)
    return {
        "emo_stats": {k: float(v) for k, v in emo.items()},
        "subject_stats": {k: float(v) for k, v in sty.items()},
    }
