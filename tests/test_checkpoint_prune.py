"""checkpoint.prune_checkpoints — the LoggingConfig.save_best_only
retention rule (keep newest N full checkpoints; never touch best_model)."""
import os

from alphazero_reversi_tpu import checkpoint as ckpt_lib


def _mkdirs(base, names):
    for n in names:
        os.makedirs(os.path.join(base, n), exist_ok=True)


def test_prune_keeps_latest_and_best(tmp_path):
    base = str(tmp_path)
    _mkdirs(base, ["it_000001", "it_000002", "it_000010", "best_model",
                   "not_a_ckpt"])
    doomed = ckpt_lib.prune_checkpoints(base, keep_latest=1)
    assert sorted(os.path.basename(p) for p in doomed) == \
        ["it_000001", "it_000002"]
    left = sorted(os.listdir(base))
    assert left == ["best_model", "it_000010", "not_a_ckpt"]


def test_prune_keep_latest_two(tmp_path):
    base = str(tmp_path)
    _mkdirs(base, ["it_000003", "it_000007", "it_000011"])
    doomed = ckpt_lib.prune_checkpoints(base, keep_latest=2)
    assert [os.path.basename(p) for p in doomed] == ["it_000003"]
    assert sorted(os.listdir(base)) == ["it_000007", "it_000011"]


def test_prune_missing_dir_is_noop(tmp_path):
    assert ckpt_lib.prune_checkpoints(str(tmp_path / "nope")) == []


def test_prune_fewer_than_keep(tmp_path):
    base = str(tmp_path)
    _mkdirs(base, ["it_000001"])
    assert ckpt_lib.prune_checkpoints(base, keep_latest=3) == []
    assert os.listdir(base) == ["it_000001"]
