"""Real two-process ``jax.distributed`` test (gloo CPU collectives).

The reference has no distributed backend at all (SURVEY.md §2.3); this
framework's is ``parallel.mesh.initialize_distributed`` +
``parallel.dp``. The CPU-mesh tests in test_parallel.py validate the
sharding math single-process; this one validates the actual multi-process
path: two OS processes x 2 local CPU devices = a 4-device global mesh with
cross-process gradient/BN ``pmean`` over gloo, through the same
``DPTrainer`` the pipeline uses. The loss history must agree across the
two processes AND with a single-process 4-device run of the identical
deterministic batch.
"""
import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from alphazero_reversi_tpu.config import MeshConfig, ModelConfig, \
    TrainingConfig
from alphazero_reversi_tpu.models import resnet
from alphazero_reversi_tpu.parallel import dp as dp_lib
from alphazero_reversi_tpu.parallel import mesh as mesh_lib

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multiproc_dp_worker.py")


def _single_process_losses():
    """The worker's training loop, in-process on a 4-device submesh."""
    mesh = mesh_lib.make_mesh(MeshConfig(data_axis=4, model_axis=1))
    model_cfg = ModelConfig(num_res_blocks=1, num_filters=8)
    train_cfg = TrainingConfig(learning_rate=1e-2, weight_decay=0.0,
                               policy_loss="soft")
    net = resnet.build_network(model_cfg)
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    trainer = dp_lib.DPTrainer(net, variables, train_cfg, mesh)

    rng = np.random.RandomState(7)
    B = 16
    losses = []
    for _ in range(3):
        planes = rng.rand(B, 8, 8, 3).astype(np.float32)
        policy = rng.rand(B, 65).astype(np.float32)
        policy /= policy.sum(-1, keepdims=True)
        value = (rng.rand(B).astype(np.float32) * 2 - 1)
        aux = trainer.step(planes, policy, value, jax.random.PRNGKey(11))
        losses.append(float(np.asarray(aux["loss"])))
    return losses


def _free_port() -> int:
    """A currently-free TCP port, so concurrent suite runs on one machine
    don't collide on the jax.distributed coordinator bind."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


PIPELINE_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "multiproc_pipeline_worker.py")


@pytest.mark.parametrize("sharded_replay", [False, True])
def test_two_process_full_pipeline(tmp_path, sharded_replay):
    """Multi-controller product path (VERDICT r2 item 2): two processes
    drive ``AlphaZeroPipeline.train`` end to end for 2 iterations on a
    4-device global mesh. Params must end bit-identical across processes,
    every per-iteration metric must agree, and ONLY process 0 may have
    written any artifact (checkpoints, best model, logs, self-play data).

    ``sharded_replay=True`` re-runs the whole thing with the data-axis-
    sharded replay buffer (r5): shard-local inserts, canonical-layout
    checkpoints, and the documented background-save sync fallback — all
    cross-process invariants must hold identically."""
    port = str(_free_port())
    extra = ["sharded"] if sharded_replay else []
    procs = [
        subprocess.Popen(
            [sys.executable, PIPELINE_WORKER, str(i), "2", port,
             str(tmp_path)] + extra,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    results = [json.loads((tmp_path / f"result_p{i}.json").read_text())
               for i in range(2)]
    # bit-identical replicated params on both processes
    assert results[0]["params_sha256"] == results[1]["params_sha256"]
    # identical promotion decisions / metric history (broadcast + same key)
    assert len(results[0]["metrics"]) == 2
    for m0, m1 in zip(results[0]["metrics"], results[1]["metrics"]):
        for k in m0:
            if k.endswith("seconds"):  # wall clock differs per process
                continue
            assert m0[k] == pytest.approx(m1[k], rel=1e-6), k
    assert results[0]["best_elo"] == pytest.approx(results[1]["best_elo"])

    # sharded evaluation (VERDICT r3 item 3): each process played only its
    # own (pairing, color-half) units — disjoint, balanced, and together
    # covering all 6 units of the 3-player arena — while the leaderboards
    # (eval/elo metrics above) still agree bit-exactly
    u0, u1 = set(results[0]["eval_units"]), set(results[1]["eval_units"])
    assert u0.isdisjoint(u1)
    assert u0 | u1 == set(range(6))
    assert len(u0) == len(u1) == 3

    # async multi-process checkpointing + broadcast resume (r4): the
    # primary alone reads the (async-written, finalized-before-read)
    # checkpoint and broadcasts the tree — so BOTH processes resume, even
    # though only the primary has a checkpoint dir at all here
    for r in results:
        assert r["resumed"] and r["resumed_iteration"] == 2
        assert r["replay_sharded"] == sharded_replay
        # the resumed pipeline holds the same number of positions the
        # trained one did (sharded mode: canonical checkpoint re-sharded)
        assert r["resumed_replay_size"] == r["replay_size"] > 0

    # primary-only writes: process 1's artifact dirs must not exist (or be
    # empty) — the non-primary logger/checkpointer creates nothing
    p0_ckpt = tmp_path / "ckpt_p0"
    assert any(n.startswith("it_") for n in os.listdir(p0_ckpt))
    assert (tmp_path / "logs_p0" / "mp" / "training.log").exists()
    assert os.listdir(tmp_path / "sp_p0")
    for name in ("ckpt_p1", "logs_p1", "sp_p1", "tourn_p1"):
        d = tmp_path / name
        assert not d.exists() or not os.listdir(d), (
            f"non-primary process wrote files into {name}: "
            f"{os.listdir(d)}")


def test_two_process_dp_training(tmp_path):
    outs = [tmp_path / f"w{i}.json" for i in range(2)]
    port = str(_free_port())
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", port, str(outs[i])],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    results = [json.loads(o.read_text()) for o in outs]
    # both processes see the same replicated loss
    assert results[0]["losses"] == pytest.approx(results[1]["losses"],
                                                 rel=1e-6)
    # and it matches the single-process 4-device run (gloo reduction
    # order may differ from the in-process psum at float precision)
    expected = _single_process_losses()
    assert results[0]["losses"] == pytest.approx(expected, rel=2e-4)
