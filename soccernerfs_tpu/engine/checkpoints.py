"""Checkpoint save/load via orbax (ref: engine/trainer.py:331-380).

Directory layout mirrors the reference:
``{base_dir}/snt_models/step-{step:09d}`` holding the
{step, params, opt_state, aux} pytree (no grad scaler — bf16 policy needs
none).  ``save_only_latest_checkpoint`` prunes older steps
(ref: trainer.py:376-380); resume loads the latest or an explicit step
(ref: trainer.py:331-350).
"""
from __future__ import annotations

import shutil
from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp

CKPT_DIR_NAME = "snt_models"


def checkpoint_dir(base_dir: Path) -> Path:
    return Path(base_dir) / CKPT_DIR_NAME


def save_checkpoint(
    base_dir: Path,
    step: int,
    state: Any,
    save_only_latest: bool = False,
) -> Path:
    ckpt_root = checkpoint_dir(base_dir)
    ckpt_root.mkdir(parents=True, exist_ok=True)
    path = ckpt_root / f"step-{step:09d}"
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path.absolute(), state, force=True)
    if save_only_latest:
        for other in ckpt_root.glob("step-*"):
            if other.name != path.name:
                shutil.rmtree(other, ignore_errors=True)
    return path


def latest_checkpoint_step(base_dir: Path) -> Optional[int]:
    ckpt_root = checkpoint_dir(base_dir)
    if not ckpt_root.exists():
        return None
    steps = sorted(
        int(p.name.split("-")[-1]) for p in ckpt_root.glob("step-*") if p.is_dir()
    )
    return steps[-1] if steps else None


def load_checkpoint(
    base_dir: Path, step: Optional[int] = None, target: Any = None
) -> tuple[int, Any]:
    """Load (step, state); ``step=None`` loads the latest
    (ref: eval_utils.py:36-64 semantics)."""
    if step is None:
        step = latest_checkpoint_step(base_dir)
        assert step is not None, f"no checkpoints under {checkpoint_dir(base_dir)}"
    path = checkpoint_dir(base_dir) / f"step-{step:09d}"
    ckptr = ocp.PyTreeCheckpointer()
    restore_args = None
    if target is not None:
        state = ckptr.restore(path.absolute(), item=target)
    else:
        state = ckptr.restore(path.absolute())
    return step, state
