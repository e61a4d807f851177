"""Async checkpointing (TrainingConfig.async_checkpointing) — the save's
disk write overlaps the caller's next iteration; readers always see a
finalized checkpoint (checkpoint.wait_for_saves / latest_checkpoint)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_reversi_tpu import checkpoint as ckpt_lib


def _tree(v: float):
    return {"w": jnp.full((32, 32), v, jnp.float32),
            "step": jnp.int32(int(v))}


def test_async_save_roundtrip(tmp_path):
    base = str(tmp_path)
    path = ckpt_lib.save_checkpoint(base, 1, _tree(3.0), async_save=True)
    ckpt_lib.wait_for_saves()
    assert os.path.isdir(path)
    restored = ckpt_lib.restore_checkpoint(path, _tree(0.0))
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.full((32, 32), 3.0, np.float32))
    assert int(restored["step"]) == 3


def test_async_saves_serialize_and_latest_waits(tmp_path):
    """Back-to-back async saves: the second waits for the first, and
    latest_checkpoint never returns a not-yet-finalized path."""
    base = str(tmp_path)
    ckpt_lib.save_checkpoint(base, 1, _tree(1.0), async_save=True)
    ckpt_lib.save_checkpoint(base, 2, _tree(2.0), async_save=True)
    latest = ckpt_lib.latest_checkpoint(base)
    assert latest is not None and latest.endswith("it_000002")
    restored = ckpt_lib.restore_checkpoint(latest, _tree(0.0))
    assert float(np.asarray(restored["w"])[0, 0]) == 2.0


def test_async_save_immune_to_source_mutation(tmp_path):
    """save() copies data out of its source buffers before returning, so
    overwriting the host source after scheduling cannot corrupt the write —
    the property that makes async safe next to donated jitted train steps."""
    base = str(tmp_path)
    src = {"w": np.full((64, 64), 7.0, np.float32)}
    ckpt_lib.save_checkpoint(base, 5, src, async_save=True)
    src["w"][:] = -1.0  # mutate after scheduling
    ckpt_lib.wait_for_saves()
    restored = ckpt_lib.restore_checkpoint(
        ckpt_lib.checkpoint_path(base, 5),
        {"w": np.zeros((64, 64), np.float32)})
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.full((64, 64), 7.0, np.float32))


def test_async_best_roundtrip(tmp_path):
    base = str(tmp_path)
    vars_in = {"params": {"k": jnp.arange(8, dtype=jnp.float32)}}
    ckpt_lib.save_best(base, vars_in, async_save=True)
    restored = ckpt_lib.restore_best(
        base, {"params": {"k": jnp.zeros(8, jnp.float32)}})
    np.testing.assert_array_equal(np.asarray(restored["params"]["k"]),
                                  np.arange(8, dtype=np.float32))


def test_sync_checkpointing_config_still_works(tmp_path):
    """async_checkpointing=False keeps the old fully-synchronous behavior
    through the pipeline save path."""
    from tests.test_pipeline import tiny_config
    from alphazero_reversi_tpu.pipeline import AlphaZeroPipeline

    cfg = tiny_config(tmp_path)
    cfg.training.async_checkpointing = False
    pipe = AlphaZeroPipeline(cfg, run_name="sync")
    pipe.train()
    latest = ckpt_lib.latest_checkpoint(cfg.training.checkpoint_dir)
    assert latest is not None
    fresh = AlphaZeroPipeline(cfg, run_name="sync2")
    assert fresh.load_checkpoint()
    assert fresh.iteration == 1


def test_replay_checkpoint_interval(tmp_path):
    """TrainingConfig.replay_checkpoint_interval=K: only every K-th save
    fetches the replay buffer; in-between checkpoints carry the previous
    snapshot (identical replay leaves), and the run's FINAL checkpoint
    always carries the live buffer."""
    from tests.test_pipeline import tiny_config
    from alphazero_reversi_tpu.pipeline import AlphaZeroPipeline

    cfg = tiny_config(tmp_path)
    cfg.training.num_epochs = 3
    cfg.training.replay_checkpoint_interval = 3
    cfg.logging.save_best_only = False  # keep it_1/it_2/it_3 on disk
    pipe = AlphaZeroPipeline(cfg, run_name="rint")
    pipe.train()
    ckpt_lib.wait_for_saves()

    template = pipe._checkpoint_tree()
    r1 = ckpt_lib.restore_checkpoint(
        ckpt_lib.checkpoint_path(cfg.training.checkpoint_dir, 1), template)
    r2 = ckpt_lib.restore_checkpoint(
        ckpt_lib.checkpoint_path(cfg.training.checkpoint_dir, 2), template)
    r3 = ckpt_lib.restore_checkpoint(
        ckpt_lib.checkpoint_path(cfg.training.checkpoint_dir, 3), template)

    # it_2 was not due (2 % 3 != 0): its replay leaves are byte-identical
    # to it_1's snapshot even though an iteration of games was inserted
    for a, b in zip(jax.tree_util.tree_leaves(r1["replay"]),
                    jax.tree_util.tree_leaves(r2["replay"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ...while the rest of the state advanced
    assert int(r2["iteration"]) == 2 and int(r1["iteration"]) == 1

    # the final save (iteration == num_epochs) is always fresh: its replay
    # cursor reflects three iterations of inserts, not the it_1 snapshot
    s1 = np.asarray(jax.tree_util.tree_leaves(r1["replay"])[-2])  # cursor
    s3 = np.asarray(jax.tree_util.tree_leaves(r3["replay"])[-2])
    assert int(s3) != int(s1)
