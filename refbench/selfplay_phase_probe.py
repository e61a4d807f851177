"""Break the flagship self-play phase (~8-10 s/iteration) into sub-steps.

The iteration metrics only report selfplay/seconds as one number; this probe
times, on the real chip at the flagship operating point
(refbench/flagship_run/resume5_config.json — 1024 games, Gumbel-32, 5x128):

  1. play_games dispatch + completion (forced by a tiny fetch of `valid`)
  2. the trajectory host fetch relabeling needs (planes/to_move/valid/value)
  3. relabel_np solve time (native solver, host)
  4. value write-back + flatten + replay insert (+ tiny fetch to force)

Honest-timing rules per PERF.md: every step ends in a host fetch; fresh PRNG
key per repeat (results are memoized across processes).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from alphazero_reversi_tpu import checkpoint as ckpt_lib
from alphazero_reversi_tpu import replay as replay_lib
from alphazero_reversi_tpu import selfplay as selfplay_lib
from alphazero_reversi_tpu.config import Config
from alphazero_reversi_tpu.models import resnet
from alphazero_reversi_tpu.pipeline import make_checkpoint_template


def main() -> None:
    # flagship operating point; the r4 run dir holds the live checkpoints
    cfg = Config.load("/root/repo/runs_flagship/run_r4_gate/config.json")
    template = make_checkpoint_template(cfg)
    path = ckpt_lib.latest_checkpoint(cfg.training.checkpoint_dir)
    restored = ckpt_lib.restore_checkpoint(path, template)
    variables = {"params": restored["state"].params,
                 "batch_stats": restored["state"].batch_stats}
    variables = jax.device_put(variables)
    jax.block_until_ready(variables)

    sp = selfplay_lib.SelfPlay(resnet.build_network(cfg.model), variables,
                               cfg.mcts, cfg.self_play, cfg.env_compat)
    buffer = replay_lib.create(cfg.training.replay_capacity,
                               cfg.model.board_size)

    for rep in range(3):
        key = jax.random.PRNGKey(time.time_ns() % (1 << 31))
        t0 = time.perf_counter()
        traj = sp.generate_games(key, cfg.self_play.num_parallel_games)
        _ = np.asarray(traj.valid)          # force search completion
        t1 = time.perf_counter()
        planes = np.asarray(traj.planes)    # the relabel fetch (f32, ~47MB)
        to_move = np.asarray(traj.to_move)
        valid = np.asarray(traj.valid)
        value = np.asarray(traj.value)
        t2 = time.perf_counter()
        new_value, stats = selfplay_lib.relabel_np(
            planes, to_move, valid, value,
            max_empties=cfg.self_play.exact_value_empties,
            compat=cfg.env_compat,
            budget_s=cfg.self_play.exact_value_budget_s)
        t3 = time.perf_counter()
        # r4 packed path: pack stones to u64 on device, fetch ~21 B/position
        packed = selfplay_lib.pack_stone_boards(traj.planes)
        mhi, mlo, thi, tlo, pto_move, pvalid, pvalue = jax.device_get(
            (*packed, traj.to_move, traj.valid, traj.value))
        t3b = time.perf_counter()
        pvalue2, pstats = selfplay_lib.relabel_packed_np(
            selfplay_lib._combine_u64_np(mhi, mlo),
            selfplay_lib._combine_u64_np(thi, tlo),
            pto_move, pvalid, pvalue,
            max_empties=cfg.self_play.exact_value_empties,
            compat=cfg.env_compat,
            budget_s=cfg.self_play.exact_value_budget_s)
        t3c = time.perf_counter()
        assert np.array_equal(pvalue2, new_value), "packed path diverged"
        traj = traj._replace(value=jnp.asarray(new_value, jnp.float32))
        flat = selfplay_lib.flatten_trajectory(traj)
        buffer = replay_lib.add(buffer, *flat)
        _ = np.asarray(buffer.size)         # force insert completion
        t4 = time.perf_counter()
        mb = planes.nbytes / 1e6
        pmb = sum(a.nbytes for a in (mhi, mlo, thi, tlo, pto_move,
                                     pvalid, pvalue)) / 1e6
        print(f"rep{rep}: search+fetch_valid {t1-t0:.2f}s | "
              f"traj fetch ({mb:.0f}MB planes) {t2-t1:.2f}s | "
              f"relabel {t3-t2:.2f}s (solve {stats['seconds']:.2f}s, "
              f"{int(stats['unique_solves'])} solves) | "
              f"PACKED pack+fetch ({pmb:.1f}MB) {t3b-t3:.2f}s "
              f"relabel {t3c-t3b:.2f}s | "
              f"writeback+flatten+insert {t4-t3c:.2f}s | "
              f"total(old-path) {t3-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
