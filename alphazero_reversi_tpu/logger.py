"""Logging / metrics: console + file + (lazy) TensorBoard.

Mirrors the reference ``Logger`` (/root/reference/src/logger.py:15-164):
stdlib logging to console and ``<log_dir>/<run>/training.log``, TensorBoard
scalars/histograms/text, and a config snapshot per run. TensorBoard's
``SummaryWriter`` import costs ~1 min cold in this image, so it is imported
lazily and only when ``use_tensorboard`` is set.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional


class Logger:
    """Run logger (reference: src/logger.py:15-151)."""

    def __init__(self, log_dir: str, run_name: str = "run",
                 level: str = "INFO", use_tensorboard: bool = True,
                 verbose: bool = True, file_output: bool = True):
        """``file_output=False`` makes a write-nothing logger: no run dir,
        no training.log, no TensorBoard, no config/model-graph snapshots —
        console only (if ``verbose``). Non-primary processes of a
        multi-controller run use this so exactly one process owns the
        artifacts (parallel.multihost)."""
        self.run_dir = os.path.join(os.path.abspath(log_dir), run_name)
        self._file_output = file_output
        if file_output:
            os.makedirs(self.run_dir, exist_ok=True)
        self._tb = None
        self._use_tb = use_tensorboard and file_output

        self.logger = logging.getLogger(f"alphazero_tpu.{run_name}")
        self.logger.setLevel(getattr(logging, level.upper(), logging.INFO))
        self.logger.handlers.clear()
        self.logger.propagate = False
        fmt = logging.Formatter(
            "%(asctime)s - %(name)s - %(levelname)s - %(message)s")
        if file_output:
            fh = logging.FileHandler(
                os.path.join(self.run_dir, "training.log"))
            fh.setFormatter(fmt)
            self.logger.addHandler(fh)
        if verbose:
            sh = logging.StreamHandler()
            sh.setFormatter(fmt)
            self.logger.addHandler(sh)
        if not self.logger.handlers:
            self.logger.addHandler(logging.NullHandler())

    # -- plain logging ----------------------------------------------------
    def info(self, msg: str, *args) -> None:
        self.logger.info(msg, *args)

    def warning(self, msg: str, *args) -> None:
        self.logger.warning(msg, *args)

    def error(self, msg: str, *args) -> None:
        self.logger.error(msg, *args)

    # -- tensorboard ------------------------------------------------------
    @property
    def writer(self):
        if self._tb is None and self._use_tb:
            from torch.utils.tensorboard import SummaryWriter  # lazy: slow
            self._tb = SummaryWriter(log_dir=self.run_dir)
        return self._tb

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        """Scalars to TB + one info line (logger.py:68-92)."""
        items = {k: float(v) for k, v in metrics.items()}
        if self.writer is not None:
            for k, v in items.items():
                self.writer.add_scalar(k, v, step)
        self.info("step %d: %s", step,
                  ", ".join(f"{k}={v:.5g}" for k, v in items.items()))

    def log_histogram(self, tag: str, values, step: int) -> None:
        if self.writer is not None:
            self.writer.add_histogram(tag, values, step)

    def log_embedding(self, tag: str, embedding, metadata=None,
                      label_img=None, step: int = 0) -> None:
        """Embeddings to the TB projector (logger.py:101-120 analog;
        ``embedding`` is any [N, D] array — e.g. flattened value-head
        activations of replay positions)."""
        if self.writer is not None:
            import numpy as np
            self.writer.add_embedding(
                np.asarray(embedding), metadata=metadata,
                label_img=label_img, tag=tag, global_step=step)

    def log_model_graph(self, graph_text: str) -> None:
        """Model structure to TB (logger.py:127-130 analog). Torch traces
        ``add_graph``; the JAX equivalent of a traced module graph is the
        tabulated Flax module summary (layers, shapes, param counts) —
        logged as text and written to ``model_graph.txt`` in the run dir."""
        if not self._file_output:
            return
        with open(os.path.join(self.run_dir, "model_graph.txt"), "w") as f:
            f.write(graph_text)
        self.log_text("model/graph", f"```\n{graph_text}\n```")

    def log_learning_rate(self, lr: float, step: int) -> None:
        """LR scalar (logger.py:132-136 analog; one optimizer group)."""
        if self.writer is not None:
            self.writer.add_scalar("lr/group_0", float(lr), step)

    def log_text(self, tag: str, text: str, step: int = 0) -> None:
        if self.writer is not None:
            self.writer.add_text(tag, text, step)

    def log_config(self, config_dict: Dict[str, Any]) -> None:
        """Config snapshot into the run dir (logger.py:60-66)."""
        if not self._file_output:
            return
        with open(os.path.join(self.run_dir, "config.json"), "w") as f:
            json.dump(config_dict, f, indent=2)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
            self._tb = None
        for h in list(self.logger.handlers):
            h.close()
            self.logger.removeHandler(h)


def setup_logger(log_dir: str, run_name: str = "run", **kwargs) -> Logger:
    """Factory matching the reference's ``setup_logger`` (logger.py:154-164)."""
    return Logger(log_dir, run_name, **kwargs)
