"""Checkpoint / resume via Orbax.

Replaces the reference's ``torch.save`` checkpointing
(/root/reference/src/trainer/pipeline.py:463-559): one pytree checkpoint
holding the full training state — params, batch stats, optimizer state, step,
iteration, best ELO, RNG key, and (optionally) the replay buffer — written
atomically by ``orbax.checkpoint`` (multi-host-safe on pods), plus a separate
weights-only "best model" directory mirroring ``best_model.pth``
(pipeline.py:483-486).

The reference needs three load paths for TorchScript-prefixed state dicts
(pipeline.py:496-540, mcts.py:458-482); none of that exists here — there is a
single pytree format.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

_STEP_RE = re.compile(r"^it_(\d+)$")


def _checkpointer(primary_only: bool = False) -> ocp.StandardCheckpointer:
    """``primary_only=True`` builds a checkpointer whose internal barriers
    involve only process 0 — the multi-controller pipeline fetches the
    (replicated) state to host numpy and writes from the primary process
    alone (parallel.multihost), so the other processes never enter orbax
    and must not be waited on."""
    if primary_only and jax.process_count() > 1:
        return ocp.StandardCheckpointer(
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=0, active_processes={0}))
    return ocp.StandardCheckpointer()


def checkpoint_path(ckpt_dir: str, iteration: int) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), f"it_{iteration:06d}")


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Most recent ``it_NNNNNN`` directory under ``ckpt_dir``, or None."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    best_it = -1
    for name in os.listdir(ckpt_dir):
        m = _STEP_RE.match(name)
        if m and int(m.group(1)) > best_it:
            best_it = int(m.group(1))
            best = os.path.join(ckpt_dir, name)
    return best


def save_checkpoint(ckpt_dir: str, iteration: int, tree: Dict[str, Any],
                    primary_only: bool = False) -> str:
    """Atomically write ``tree`` as ``<ckpt_dir>/it_<iteration>``.

    ``tree`` is any pytree of arrays/scalars (the pipeline passes
    ``{"state": TrainState, "iteration": ..., "best_elo": ..., "rng": ...,
    "replay": ReplayBuffer?}``) — the analog of pipeline.py:469-478's dict.
    """
    path = checkpoint_path(ckpt_dir, iteration)
    ckptr = _checkpointer(primary_only=primary_only)
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def prune_checkpoints(ckpt_dir: str, keep_latest: int = 1) -> list:
    """Delete all but the newest ``keep_latest`` full ``it_NNNNNN``
    checkpoints (the ``best_model`` directory is never touched).

    Backs ``LoggingConfig.save_best_only``: with it set, the pipeline keeps
    only the latest full checkpoint (resume still works) plus the promoted
    best-model weights, instead of accumulating a ~full-state checkpoint per
    ``save_interval``. The reference declared the flag and never consumed it
    (/root/reference/src/config.py:77); this retention rule is the
    documented semantics here. Returns the deleted paths.
    """
    import shutil

    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return []
    its = sorted(
        (int(m.group(1)), os.path.join(ckpt_dir, name))
        for name in os.listdir(ckpt_dir)
        if (m := _STEP_RE.match(name)))
    doomed = [path for _, path in its[:max(0, len(its) - keep_latest)]]
    for path in doomed:
        shutil.rmtree(path, ignore_errors=True)
    return doomed


def restore_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore a checkpoint into the structure of ``template`` (a concrete
    pytree with the right shapes/dtypes, e.g. a freshly initialized state)."""
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                      template)
    return _checkpointer().restore(os.path.abspath(path), abstract)


def save_best(ckpt_dir: str, variables: Dict[str, Any],
              primary_only: bool = False) -> str:
    """Weights-only best model (``best_model.pth`` analog,
    pipeline.py:483-486)."""
    path = os.path.join(os.path.abspath(ckpt_dir), "best_model")
    ckptr = _checkpointer(primary_only=primary_only)
    ckptr.save(path, variables, force=True)
    ckptr.wait_until_finished()
    return path


def restore_best(ckpt_dir: str, template: Dict[str, Any]
                 ) -> Optional[Dict[str, Any]]:
    """Load the best model's variables if present (pipeline.py:398-434)."""
    path = os.path.join(os.path.abspath(ckpt_dir), "best_model")
    if not os.path.isdir(path):
        return None
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                      template)
    return _checkpointer().restore(path, abstract)
