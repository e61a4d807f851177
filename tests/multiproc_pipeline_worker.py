"""Worker for the two-process full-PIPELINE test (multi-controller).

Each process runs ``AlphaZeroPipeline.train`` for 2 iterations over a
2-process x 2-local-CPU-device global mesh (gloo collectives) through the
PRODUCT path — sharded self-play, sharded exact-value relabeling, DP
training, identical host arenas with a broadcast promotion decision, and
primary-only artifact writes (parallel.multihost). Every process gets its
OWN artifact directories (``*_p<pid>``) so the parent test can assert that
the non-primary process wrote nothing at all.

Writes a JSON summary (params digest + metric history) for the parent to
cross-check bit-identity across processes.
"""
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid, nproc = int(sys.argv[1]), int(sys.argv[2])
port, outdir = sys.argv[3], sys.argv[4]
# optional 5th arg "sharded": data-axis-sharded replay buffer (r5) —
# shard-local inserts, canonical checkpoints, sync-fallback background save
sharded_replay = len(sys.argv) > 5 and sys.argv[5] == "sharded"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from alphazero_reversi_tpu.parallel import mesh as mesh_lib

mesh_lib.initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
assert len(jax.devices()) == 2 * nproc, jax.devices()

import numpy as np

from alphazero_reversi_tpu.config import Config
from alphazero_reversi_tpu.parallel import multihost as mh
from alphazero_reversi_tpu.pipeline import AlphaZeroPipeline

cfg = Config()
cfg.seed = 5
cfg.model.num_res_blocks = 1
cfg.model.num_filters = 8
cfg.model.value_head_hidden_size = 16
cfg.model.compute_dtype = "float32"
cfg.mcts.num_simulations = 4
cfg.mcts.max_depth = 8
cfg.mesh.data_axis = -1  # 4-device global mesh
cfg.self_play.num_games = 4
cfg.self_play.num_parallel_games = 4
cfg.self_play.save_every = 1  # exercise gather + primary-only persistence
cfg.self_play.exact_value_empties = 6  # exercise sharded relabeling
cfg.self_play.exact_value_budget_s = 30.0
cfg.training.batch_size = 16
cfg.training.num_epochs = 2
cfg.training.replay_capacity = 512
# r4: primary-only background fetch+save (collective-free local reads)
cfg.training.background_checkpoint_fetch = True
cfg.training.shard_replay_buffer = sharded_replay
cfg.tournament.rounds = 1
cfg.tournament.num_simulations = 2
# 4 games/pairing -> each (pairing, color-half) unit is a 2-game batch,
# which divides the 2-device LOCAL mesh: the process's eval units shard
# over both its local devices (r5 device-parallel eval) instead of
# replicating on one
cfg.tournament.games_per_pair = 4
cfg.logging.use_tensorboard = False
cfg.logging.verbose = False
# per-process artifact dirs: the parent asserts p1's stay empty
cfg.training.checkpoint_dir = os.path.join(outdir, f"ckpt_p{pid}")
cfg.logging.log_dir = os.path.join(outdir, f"logs_p{pid}")
cfg.self_play.save_dir = os.path.join(outdir, f"sp_p{pid}")
cfg.tournament.output_dir = os.path.join(outdir, f"tourn_p{pid}")

pipe = AlphaZeroPipeline(cfg, run_name="mp")
pipe.train()

# async multi-process checkpointing + broadcast resume (r4): the primary
# finalizes its in-flight orbax write, reads the checkpoint alone, and
# broadcasts the tree — every process resumes even though only the
# primary's checkpoint dir exists (write-isolation setup).
pipe2 = AlphaZeroPipeline(cfg, run_name="mp_resume")
resumed = pipe2.load_checkpoint()
resumed_iteration = pipe2.iteration if resumed else -1

params_np = mh.fetch_replicated(pipe.mesh, pipe.learner.state.params)
digest = hashlib.sha256()
for leaf in jax.tree_util.tree_leaves(params_np):
    digest.update(np.ascontiguousarray(leaf).tobytes())

from alphazero_reversi_tpu.parallel import replay_sharded as rs_lib

with open(os.path.join(outdir, f"result_p{pid}.json"), "w") as f:
    json.dump({
        "pid": pid,
        "params_sha256": digest.hexdigest(),
        "replay_sharded": bool(rs_lib.is_sharded(pipe.buffer)),
        "replay_size": rs_lib.total_size(pipe.buffer),
        "resumed_replay_size": rs_lib.total_size(pipe2.buffer),
        "metrics": [{k: float(v) for k, v in m.items()}
                    for m in pipe.metrics_history],
        "best_elo": float(pipe.best_elo),
        # sharded eval (VERDICT r3 item 3): which tournament units this
        # process played in the last iteration's evaluation
        "eval_units": list(pipe._last_eval_units),
        "resumed": bool(resumed),
        "resumed_iteration": int(resumed_iteration),
    }, f)
print(f"proc {pid} done", flush=True)
