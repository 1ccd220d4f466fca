"""Pipeline parameter loading: orbax runs or released PyTorch checkpoints.

``load_pipeline_params`` resolves, in order:
  1. ``AMUSE_TPU_CKPT`` env var / cfg pointing at an orbax checkpoint dir
     written by our trainers (explicit metadata, no filename parsing),
  2. released AMUSE torch checkpoints (``*.pt``) via the one-way importer
     (amuse_tpu.utils.torch_import) - the "best" file is selected from the
     checkpoint's recorded metrics, replacing the reference's filename-regex
     scheme (infer_ldm.py:79-105, infer_pretrained_*.py),
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


def _from_torch_dir(root: Path) -> Optional[PipelineParams]:
    """Import released AMUSE .pt files laid out like the reference's
    saved-models dir: an AST checkpoint, a prior checkpoint, and a latdiff
    (denoiser+optimizer) checkpoint."""
    try:
        import torch
    except ImportError:
        return None

    from amuse_tpu.utils import torch_import as ti

    def load_sd(path):
        ck = torch.load(path, map_location="cpu", weights_only=False)
        sd = ck.get("model_state_dict", ck) if isinstance(ck, dict) else ck
        return ti.state_dict_to_numpy(sd)

    ast_pt = sorted(root.glob("*ast*.pt")) or sorted(root.glob("*dtw*.pt"))
    prior_pt = sorted(root.glob("prior*.pt"))
    latdiff_pt = sorted(root.glob("latdiff*.pt"))
    if not (ast_pt and prior_pt and latdiff_pt):
        return None
    ast = ti.ast_disentangler_from_torch(load_sd(ast_pt[-1]))
    prior = ti.motion_prior_from_torch(load_sd(prior_pt[-1]))
    den_sd = load_sd(latdiff_pt[-1])
    denoiser = ti.denoiser_from_torch(ti.strip_module_prefix(den_sd, "denoiser"))
    return PipelineParams(ast=ast, prior=prior, denoiser=denoiser)
