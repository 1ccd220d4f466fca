"""Pipeline parameter loading: orbax runs or released PyTorch checkpoints.

``load_pipeline_params`` resolves, in order:
  1. ``AMUSE_TPU_CKPT`` env var / cfg pointing at an orbax checkpoint dir
     written by our trainers (explicit metadata, no filename parsing),
  2. released AMUSE torch checkpoints (``*.pt`` / ``model_*.pkl``) via the
     one-way importer (amuse_tpu.utils.torch_import) - the "best" file is
     selected by the reference's OWN filename-metric grammars
     (infer_ldm.py:79-105, infer_pretrained_ast_evp.py:22-31; implemented
     + fuzz-tested below) so a released saved-models dir resolves to the
     same files the reference would load,
  3. None (callers fall back to random weights with a warning).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

from amuse_tpu.infer.pipeline import PipelineParams


def load_pipeline_params(cfg=None) -> Optional[PipelineParams]:
    """None ONLY when no checkpoint is configured; a configured-but-broken
    checkpoint raises - silently falling back to random weights would turn
    a typo'd path into garbage inference with no error."""
    root = os.environ.get("AMUSE_TPU_CKPT", "")
    if not root:
        return None
    root = Path(root)
    if (root / "metadata.json").exists() or any(root.glob("step_*")):
        params = _from_orbax(root)
    elif root.is_dir() and any(root.glob("*.pt")):
        params = _from_torch_dir(root)
    else:
        raise FileNotFoundError(
            f"AMUSE_TPU_CKPT={root} is neither an orbax run dir "
            "(metadata.json / step_*) nor a directory of released .pt files"
        )
    if params is None:
        raise ValueError(
            f"AMUSE_TPU_CKPT={root} was found but could not be assembled "
            "into pipeline params - an LPDM (prior+denoiser) checkpoint "
            "also needs AMUSE_TPU_AST_CKPT pointing at the stage-1 run"
        )
    return params


def _unwrap_params(tree):
    """Trainers checkpoint the full TrainState (params, opt_state, step);
    older checkpoints stored bare params. Accept both layouts."""
    if isinstance(tree, dict) and "params" in tree:
        return tree["params"]
    if isinstance(tree, (list, tuple)) and len(tree) == 3:
        return tree[0]
    return tree


def _from_orbax(root: Path) -> Optional[PipelineParams]:
    from amuse_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(root)
    tree, _ = mgr.restore()
    tree = _unwrap_params(tree)
    # trainers save {"prior": ..., "denoiser": ...} or raw AST params
    if isinstance(tree, dict) and {"prior", "denoiser"} <= set(tree):
        ast = _maybe_ast_params()
        if ast is None:
            return None
        return PipelineParams(ast=ast, prior=tree["prior"], denoiser=tree["denoiser"])
    return None


def _maybe_ast_params():
    path = os.environ.get("AMUSE_TPU_AST_CKPT", "")
    if not path:
        return None
    from amuse_tpu.train.checkpoint import CheckpointManager

    tree, _ = CheckpointManager(Path(path)).restore()
    return _unwrap_params(tree)


# --------------------------------------------------- filename-grammar "best"
#
# The reference selects released checkpoints by metrics baked into the
# FILENAME. The exact grammars (fuzz-tested against these format strings in
# tests/test_checkpoint_import.py):
#   stage-1 AST  (trainer.py:328):
#     model_{e}_tL{:.8f}_tEA{:.8f}_tPA{:.8f}_vL{:.8f}_vEA{:.8f}_vPA{:.8f}.pkl
#     selection (infer_pretrained_ast_evp.py:22-31): max tEA (field [3];
#     max tPA, field [4], for the "identity" ablation), numbers extracted by
#     char-stripping (_get_num); quirk at :31: if the winner's epoch is 0,
#     take the file containing "_1_" instead.
#   stage-2 prior/latdiff (trainer.py:470-496):
#     {prior_model_NoOpt|latdiff_model_wOpt}_recF{:.4f}_..._total{:.4f}_e{e}.pt
#     selection (infer_ldm.py:79-88): latdiff with min total, where total is
#     the first \d+\.\d+ in stem.split("_")[-2] and the epoch the first int
#     in stem.split("_")[-1]; the prior then loads BY THAT EPOCH
#     (infer_ldm.py:105 sets load_epoch_prior = ldm_epoch).


def _get_num(field: str) -> Optional[float]:
    """The reference's char-strip number extractor
    (infer_pretrained_ast_evp.py:53-58): non-digit/non-dot chars become
    spaces, first token parses as float ("tEA0.9512" -> 0.9512)."""
    chars = [c if c.isdigit() or c == "." else " " for c in field]
    toks = "".join(chars).split()
    return float(toks[0]) if toks else None


def select_ast_checkpoint(paths: list, ablation: Optional[str] = None):
    """Reference AST selection: max train-emotion-accuracy (tEA), or max
    train-person-accuracy (tPA) under the "identity" ablation, with the
    epoch-0 -> "_1_" quirk. Files whose stems don't parse are skipped; if
    none parse, fall back to the lexicographically last file."""
    best, best_score = None, -float("inf")
    field = 4 if ablation == "identity" else 3
    for p in paths:
        parts = Path(p).stem.split("_")
        score = _get_num(parts[field]) if len(parts) > field else None
        if score is not None and score > best_score:
            best, best_score = p, score
    if best is None:
        return sorted(paths)[-1]
    epoch = _get_num(Path(best).stem.split("_")[1])
    if epoch is not None and int(epoch) == 0:
        with_1 = [p for p in paths if "_1_" in str(p)]
        if with_1:
            return with_1[0]
    return best


def _total_and_epoch(path) -> tuple[Optional[float], Optional[int]]:
    import re

    parts = Path(path).stem.split("_")
    if len(parts) < 2:
        return None, None
    m_total = re.findall(r"\d+\.\d+", parts[-2])
    m_epoch = re.search(r"\d+", parts[-1])
    return (
        float(m_total[0]) if m_total else None,
        int(m_epoch.group()) if m_epoch else None,
    )


def select_latdiff_checkpoint(paths: list):
    """min total loss (infer_ldm.py:79-88); -> (path, epoch)."""
    best, best_total, best_epoch = None, float("inf"), None
    for p in paths:
        total, epoch = _total_and_epoch(p)
        if total is not None and total < best_total:
            best, best_total, best_epoch = p, total, epoch
    if best is None:
        p = sorted(paths)[-1]
        return p, _total_and_epoch(p)[1]
    return best, best_epoch


def select_prior_checkpoint(paths: list, epoch: Optional[int]):
    """The prior saved at the chosen latdiff's epoch (infer_ldm.py:105);
    falls back to min total when no epoch matches (e.g. a curated release
    shipping a single prior file)."""
    if epoch is not None:
        matches = [p for p in paths if _total_and_epoch(p)[1] == epoch]
        if matches:
            return matches[0]
    return select_latdiff_checkpoint(paths)[0]


def _from_torch_dir(root: Path) -> Optional[PipelineParams]:
    """Import released AMUSE checkpoints laid out like the reference's
    saved-models dirs: a stage-1 AST checkpoint (``model_*.pkl`` or
    ``*ast*/*dtw*.pt``), a prior, and a latdiff (denoiser+optimizer)
    checkpoint — each selected by the reference's own filename-metric
    grammar (see above), tolerating DataParallel ``module.`` layouts
    (torch_import.state_dict_to_numpy auto-strips)."""
    try:
        import torch
    except ImportError:
        return None

    from amuse_tpu.utils import torch_import as ti

    def load_sd(path):
        ck = torch.load(path, map_location="cpu", weights_only=False)
        sd = ck.get("model_state_dict", ck) if isinstance(ck, dict) else ck
        return ti.state_dict_to_numpy(sd)

    ast_pt = (
        sorted(root.glob("*ast*.pt"))
        or sorted(root.glob("*dtw*.pt"))
        or sorted(root.glob("model_*.pkl"))  # the grammar trainer.py:328 writes
    )
    prior_pt = sorted(root.glob("prior*.pt"))
    latdiff_pt = sorted(root.glob("latdiff*.pt"))
    if not (ast_pt and prior_pt and latdiff_pt):
        return None
    latdiff_best, ldm_epoch = select_latdiff_checkpoint(latdiff_pt)
    ast = ti.ast_disentangler_from_torch(load_sd(select_ast_checkpoint(ast_pt)))
    prior = ti.motion_prior_from_torch(
        load_sd(select_prior_checkpoint(prior_pt, ldm_epoch))
    )
    den_sd = load_sd(latdiff_best)
    denoiser = ti.denoiser_from_torch(ti.strip_module_prefix(den_sd, "denoiser"))
    return PipelineParams(ast=ast, prior=prior, denoiser=denoiser)
