"""Training-state checkpointing (orbax) with per-level resume.

The reference never checkpoints optimizer/model state mid-training
(SURVEY.md §5.4); its only persistence is per-stage artifacts.  Here the
n-gram-level structure stays the coarse recovery boundary (per-level .npz
embeddings, trainer.py), and this module adds the fine boundary: params +
opt_state + epoch saved every N epochs via orbax, restored on restart.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

from protgram_directgcn_tpu.utils.io import logger


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(ckpt_dir: os.PathLike, step: int, params: Any, opt_state: Any) -> str:
    """Save (params, opt_state) at `step`; returns the checkpoint path."""
    import jax

    path = os.path.join(os.path.abspath(str(ckpt_dir)), f"step_{step}")
    state = {
        "step": step,
        "params": params,
        # Drop non-array leaves (optax count schedules etc. are arrays already).
        "opt_state": jax.tree_util.tree_map(lambda x: x, opt_state),
    }
    _checkpointer().save(path, state, force=True)
    return path


def latest_step(ckpt_dir: os.PathLike) -> Optional[int]:
    if not os.path.isdir(str(ckpt_dir)):
        return None
    steps = []
    for name in os.listdir(str(ckpt_dir)):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                continue
    return max(steps) if steps else None


def restore_train_state(
    ckpt_dir: os.PathLike, params_template: Any, opt_state_template: Any
) -> Optional[Tuple[int, Any, Any]]:
    """Restore the latest checkpoint matching the given pytree templates."""
    step = latest_step(ckpt_dir)
    if step is None:
        return None
    path = os.path.join(os.path.abspath(str(ckpt_dir)), f"step_{step}")
    template = {"step": step, "params": params_template, "opt_state": opt_state_template}
    try:
        state = _checkpointer().restore(path, item=template)
    except Exception as e:
        logger.warning("checkpoint restore failed at %s: %s", path, e)
        return None
    logger.info("restored training state from %s", path)
    return int(state["step"]), state["params"], state["opt_state"]
