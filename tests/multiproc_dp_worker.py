"""Worker for the two-process jax.distributed DP test.

Each process runs this with ``<pid> <nproc> <port> <outfile>``. It
initializes the process group through the PRODUCT path
(``parallel.mesh.initialize_distributed``), builds the global mesh
(2 procs x 2 local CPU devices = 4 global), runs DP train steps on a
deterministic batch via ``parallel.dp``, and writes the loss history to
``outfile`` for the parent test to cross-check against a single-process
4-device run of the same step.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid, nproc = int(sys.argv[1]), int(sys.argv[2])
port, outfile = sys.argv[3], sys.argv[4]

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from alphazero_reversi_tpu.parallel import mesh as mesh_lib

mesh_lib.initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
assert len(jax.devices()) == 2 * nproc, jax.devices()
assert len(jax.local_devices()) == 2

import numpy as np

from alphazero_reversi_tpu.config import MeshConfig, ModelConfig, \
    TrainingConfig
from alphazero_reversi_tpu.models import resnet
from alphazero_reversi_tpu.parallel import dp as dp_lib

mesh = mesh_lib.make_mesh(MeshConfig(data_axis=-1, model_axis=1))
assert mesh.shape[mesh_lib.DATA_AXIS] == 2 * nproc

model_cfg = ModelConfig(num_res_blocks=1, num_filters=8)
train_cfg = TrainingConfig(learning_rate=1e-2, weight_decay=0.0,
                           policy_loss="soft")
net = resnet.build_network(model_cfg)
variables = resnet.init_variables(net, jax.random.PRNGKey(0))

trainer = dp_lib.DPTrainer(net, variables, train_cfg, mesh)

# every process derives the SAME global batch from a fixed seed, then
# DPTrainer.step shards it over the data axis
rng = np.random.RandomState(7)
B = 16
losses = []
for step in range(3):
    planes = rng.rand(B, 8, 8, 3).astype(np.float32)
    policy = rng.rand(B, 65).astype(np.float32)
    policy /= policy.sum(-1, keepdims=True)
    value = (rng.rand(B).astype(np.float32) * 2 - 1)
    aux = trainer.step(planes, policy, value, jax.random.PRNGKey(11))
    losses.append(float(np.asarray(aux["loss"])))

with open(outfile, "w") as f:
    json.dump({"pid": pid, "losses": losses}, f)
print(f"proc {pid} done: {losses}", flush=True)
