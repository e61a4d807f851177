"""Logger TB-surface parity tests (reference src/logger.py:94-151).

TensorBoard's real ``SummaryWriter`` import is ~1 min cold in this image, so
the writer is replaced by a recording stub — these tests cover the Logger's
dispatch and file side effects, not TB serialization.
"""
import os

import numpy as np
import pytest

from alphazero_reversi_tpu.config import ModelConfig
from alphazero_reversi_tpu.logger import Logger
from alphazero_reversi_tpu.models import resnet


class RecordingWriter:
    def __init__(self):
        self.calls = []

    def __getattr__(self, name):
        def record(*args, **kwargs):
            self.calls.append((name, args, kwargs))
        return record


@pytest.fixture
def logger(tmp_path):
    lg = Logger(str(tmp_path), "t", use_tensorboard=False, verbose=False)
    lg._tb = RecordingWriter()
    yield lg
    lg.close()


def _calls(logger, method):
    return [c for c in logger._tb.calls if c[0] == method]


def test_log_metrics_scalars_and_file(logger, tmp_path):
    logger.log_metrics({"train/loss": 1.5, "eval/elo": 1200.0}, step=3)
    tags = {args[0]: args[1] for _, args, _ in _calls(logger, "add_scalar")}
    assert tags == {"train/loss": 1.5, "eval/elo": 1200.0}
    log_text = (tmp_path / "t" / "training.log").read_text()
    assert "train/loss=1.5" in log_text


def test_log_embedding(logger):
    emb = np.arange(12.0).reshape(4, 3)
    logger.log_embedding("replay/positions", emb,
                         metadata=["a", "b", "c", "d"], step=7)
    (_, args, kwargs), = _calls(logger, "add_embedding")
    np.testing.assert_array_equal(args[0], emb)
    assert kwargs["metadata"] == ["a", "b", "c", "d"]
    assert kwargs["tag"] == "replay/positions"
    assert kwargs["global_step"] == 7


def test_log_learning_rate(logger):
    logger.log_learning_rate(1e-3, step=2)
    (_, args, _), = _calls(logger, "add_scalar")
    assert args == ("lr/group_0", 1e-3, 2)


def test_log_model_graph_writes_file_and_text(logger, tmp_path):
    net = resnet.build_network(ModelConfig(num_res_blocks=1, num_filters=8))
    summary = resnet.tabulate_network(net)
    assert "AlphaZeroNet" in summary and "float32[1,65]" in summary
    logger.log_model_graph(summary)
    assert (tmp_path / "t" / "model_graph.txt").read_text() == summary
    (_, args, _), = _calls(logger, "add_text")
    assert args[0] == "model/graph" and summary in args[1]


def test_tb_disabled_is_noop(tmp_path):
    lg = Logger(str(tmp_path), "off", use_tensorboard=False, verbose=False)
    try:
        assert lg.writer is None
        # none of these should raise without a writer
        lg.log_metrics({"x": 1.0}, 0)
        lg.log_embedding("e", np.zeros((2, 2)))
        lg.log_learning_rate(0.1, 0)
        lg.log_histogram("h", np.zeros(4), 0)
        lg.log_text("t", "hi")
    finally:
        lg.close()
