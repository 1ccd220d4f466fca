"""Shared builders for synthetic torch state_dicts (reference key naming).

One source of truth for the torch ``nn.Linear`` / ``LayerNorm`` /
``MultiheadAttention`` / ``TransformerEncoderLayer`` / ``DecoderLayer`` key
layouts the importer consumes - previously duplicated between
test_checkpoint_import.py and test_loaders_extra.py, where the two copies
could drift from the convention independently.
"""

from __future__ import annotations

import numpy as np


def lin(rng: np.random.Generator, prefix: str, din: int, dout: int, sd: dict) -> None:
    sd[f"{prefix}.weight"] = rng.normal(scale=0.05, size=(dout, din)).astype(np.float32)
    sd[f"{prefix}.bias"] = rng.normal(scale=0.05, size=dout).astype(np.float32)


def ln(rng: np.random.Generator, prefix: str, d: int, sd: dict) -> None:
    sd[f"{prefix}.weight"] = np.ones(d, np.float32)
    sd[f"{prefix}.bias"] = np.zeros(d, np.float32)


def mha(rng: np.random.Generator, prefix: str, d: int, sd: dict) -> None:
    sd[f"{prefix}.in_proj_weight"] = rng.normal(scale=0.05, size=(3 * d, d)).astype(np.float32)
    sd[f"{prefix}.in_proj_bias"] = np.zeros(3 * d, np.float32)
    lin(rng, f"{prefix}.out_proj", d, d, sd)


def enc_layer(rng: np.random.Generator, prefix: str, d: int, ff: int, sd: dict) -> None:
    mha(rng, f"{prefix}.self_attn", d, sd)
    lin(rng, f"{prefix}.linear1", d, ff, sd)
    lin(rng, f"{prefix}.linear2", ff, d, sd)
    ln(rng, f"{prefix}.norm1", d, sd)
    ln(rng, f"{prefix}.norm2", d, sd)


def dec_layer(rng: np.random.Generator, prefix: str, d: int, ff: int, sd: dict) -> None:
    mha(rng, f"{prefix}.self_attn", d, sd)
    mha(rng, f"{prefix}.multihead_attn", d, sd)
    lin(rng, f"{prefix}.linear1", d, ff, sd)
    lin(rng, f"{prefix}.linear2", ff, d, sd)
    ln(rng, f"{prefix}.norm1", d, sd)
    ln(rng, f"{prefix}.norm2", d, sd)
    ln(rng, f"{prefix}.norm3", d, sd)
