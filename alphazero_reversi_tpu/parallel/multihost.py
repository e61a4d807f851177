"""Multi-controller (multi-process) helpers for the product pipeline.

The reference is single-process (SURVEY.md §2.3; its PLAN.md:196
"Implement distributed training" was never built). This framework's
collectives are proven cross-process at the DPTrainer level
(tests/test_multiprocess.py, gloo CPU); this module carries the remaining
product-layer obligations of a multi-controller run of
``AlphaZeroPipeline`` — every process executes the same program over the
global mesh, but exactly ONE writes artifacts and all of them must agree
bit-exactly on control decisions:

* **primary-only side effects** — checkpoints, best-model saves, logging,
  trajectory persistence happen on ``jax.process_index() == 0`` only.
* **replicated fetches** — host access to a global array goes through an
  explicit reshard-to-replicated (an all-gather when the value was
  sharded), because ``np.asarray`` on a non-fully-addressable array raises.
* **agreement** — the promotion decision is computed identically on every
  process (same PRNG key, same replicated weights, deterministic arena)
  and then broadcast from process 0 anyway, so divergence is impossible
  rather than merely unlikely.
* **process-local batch work** — host-side post-processing of a sharded
  self-play batch (the exact-endgame relabeling) runs on each process's
  OWN shard of the games and reassembles a global array
  (``jax.make_array_from_process_local_data``) — the solver work
  parallelizes across hosts instead of being duplicated.

Single-process calls collapse to cheap no-ops, so the pipeline uses these
helpers unconditionally.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import mesh as mesh_lib


def process_count() -> int:
    return jax.process_count()


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that owns all file writes and logging."""
    return jax.process_index() == 0


def fetch_replicated(mesh: Mesh, tree: Any) -> Any:
    """Host (numpy) copy of a pytree of global arrays on EVERY process.

    Leaves are resharded to fully-replicated first (an all-gather for
    sharded leaves, a no-op for already-replicated ones) — ``np.asarray``
    alone raises on non-fully-addressable arrays. Non-jax leaves pass
    through ``np.asarray`` directly.
    """
    repl = mesh_lib.replicated(mesh)

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            x = jax.device_put(x, repl)
        return np.asarray(x)

    return jax.tree_util.tree_map(fetch, tree)


def all_leaves_replicated(tree: Any) -> bool:
    """True iff every jax.Array leaf is fully addressable or fully
    replicated (its process-local shard holds the complete value) — the
    precondition for the collective-free :func:`fetch_replicated_local`.
    Metadata-only and identical on every process (shardings are built by
    the same program), so gating on it cannot diverge across hosts."""
    for x in jax.tree_util.tree_leaves(tree):
        if isinstance(x, jax.Array) and not x.is_fully_addressable \
                and not x.sharding.is_fully_replicated:
            return False
    return True


def fetch_replicated_local(tree: Any) -> Any:
    """Collective-free host (numpy) copy of a pytree whose jax.Array
    leaves are fully replicated: reads each leaf's process-LOCAL shard
    copy (``addressable_shards[0]``) instead of all-gathering.

    Unlike :func:`fetch_replicated` this performs NO cross-process
    collective, which makes it safe to call from a background thread — it
    cannot interleave with (and deadlock against) the main thread's
    collectives. Used by the multi-process background checkpoint fetch
    (pipeline.save_checkpoint); precondition checked by
    :func:`all_leaves_replicated`.
    """
    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            assert x.sharding.is_fully_replicated, x.sharding
            return np.asarray(x.addressable_shards[0].data)
        return np.asarray(x)

    return jax.tree_util.tree_map(fetch, tree)


def local_block(arr: jax.Array, axis: int) -> np.ndarray:
    """This process's contiguous block of a global array sharded along
    ``axis`` (replicated along every other axis), as numpy.

    Standard meshes enumerate ``jax.devices()`` process-major, so one
    process's shards are contiguous along the sharded axis; asserted here
    rather than assumed.
    """
    # drop duplicate replicas of the same slice FIRST (axis replicated on a
    # model dimension yields identical indices once per replica) — dedup
    # must precede the contiguity check, and skipping np.asarray on
    # replicas avoids fetching the same bytes twice
    entries = []
    seen = set()
    for s in sorted(arr.addressable_shards,
                    key=lambda s: s.index[axis].start or 0):
        st = s.index[axis].start or 0
        sp = (s.index[axis].stop if s.index[axis].stop is not None
              else arr.shape[axis])
        if (st, sp) in seen:
            continue
        seen.add((st, sp))
        entries.append((st, sp, np.asarray(s.data)))
    for i in range(1, len(entries)):
        if entries[i][0] != entries[i - 1][1]:
            raise ValueError(
                f"process-local shards not contiguous along axis {axis}: "
                f"{[(st, sp) for st, sp, _ in entries]}")
    blocks = [b for _, _, b in entries]
    return np.concatenate(blocks, axis=axis) if len(blocks) > 1 else blocks[0]


def from_local_block(mesh: Mesh, local: np.ndarray, axis: int) -> jax.Array:
    """Inverse of ``local_block``: build the global array (sharded along
    ``axis`` over the data mesh axis) from each process's block."""
    spec = tuple(mesh_lib.DATA_AXIS if i == axis else None
                 for i in range(local.ndim))
    sharding = NamedSharding(mesh, P(*spec))
    return jax.make_array_from_process_local_data(sharding, local)


def canonical_tb_sharding(mesh: Mesh, x: jax.Array) -> jax.Array:
    """Reshard a ``[T, B, ...]`` trajectory array to the canonical layout:
    games (axis 1) split over the data mesh axis, everything else
    replicated. A no-op when XLA already chose that sharding."""
    spec = tuple(mesh_lib.DATA_AXIS if i == 1 else None
                 for i in range(x.ndim))
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def aggregate_stats(stats: dict) -> dict:
    """Combine per-process host-side stats dicts: sums counts, maxes the
    wall-clock/extremum fields. No-op single-process."""
    if not is_multiprocess():
        return stats
    from jax.experimental import multihost_utils

    keys = sorted(stats)
    vec = np.asarray([float(stats[k]) for k in keys], np.float64)
    gathered = np.asarray(multihost_utils.process_allgather(vec))
    out = {}
    for i, k in enumerate(keys):
        col = gathered[:, i]
        out[k] = float(col.max()) if k in ("seconds", "max_empties_solved") \
            else float(col.sum())
    return out


def relabel_sharded(mesh: Mesh, traj, max_empties: int, compat: bool,
                    budget_s, fetch_timeout_s=None):
    """Multi-controller form of ``selfplay.relabel_exact_values_with_stats``:
    each process runs the native endgame solver over its OWN shard of the
    games (the solver work parallelizes across hosts; per-process wall clock
    is bounded by ``budget_s``) and the relabeled value plane is reassembled
    into a global array. ``fetch_timeout_s`` arms the relay-hang watchdog on
    the per-process shard fetches (hostfetch.py). Returns
    ``(traj, aggregated_stats)``."""
    from .. import hostfetch
    from .. import selfplay as selfplay_lib

    # pack stones to u64 bitboards ON DEVICE before any host transfer: the
    # per-process shard fetch is ~36x smaller than fetching f32 planes
    # (selfplay.pack_stone_boards)
    mhi, mlo, thi, tlo = (
        canonical_tb_sharding(mesh, a)
        for a in selfplay_lib.pack_stone_boards(traj.planes))
    to_move = canonical_tb_sharding(mesh, traj.to_move)
    valid = canonical_tb_sharding(mesh, traj.valid)
    value = canonical_tb_sharding(mesh, traj.value)
    blocks = hostfetch.guarded(
        lambda: tuple(local_block(a, 1) for a in
                      (mhi, mlo, thi, tlo, to_move, valid, value)),
        fetch_timeout_s, what="relabel shard fetch")
    new_local, stats = selfplay_lib.relabel_packed_np(
        selfplay_lib._combine_u64_np(blocks[0], blocks[1]),
        selfplay_lib._combine_u64_np(blocks[2], blocks[3]),
        *blocks[4:],
        max_empties=max_empties, compat=compat, budget_s=budget_s)
    new_value = from_local_block(mesh, np.ascontiguousarray(new_local), 1)
    return traj._replace(value=new_value), aggregate_stats(stats)


def gather_unit_scores(scores: np.ndarray, owners: np.ndarray) -> np.ndarray:
    """Merge the sharded tournament's per-unit score rows across processes
    (``arena.Arena.run_tournament_sharded``): allgather the local ``[U, G]``
    arrays and keep, for each unit, its OWNER process's row. No-op
    single-process."""
    if not is_multiprocess():
        return scores
    from jax.experimental import multihost_utils

    gathered = np.asarray(multihost_utils.process_allgather(scores))
    return gathered[owners, np.arange(scores.shape[0])]


def broadcast_from_primary(value):
    """Bit-exact agreement on a (small) host value: process 0's copy wins.
    No-op single-process."""
    if not is_multiprocess():
        return value
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(value)


def barrier(name: str) -> None:
    """Block until every process reaches this point (e.g. so a checkpoint
    written by the primary is visible before anyone resumes from it).
    No-op single-process."""
    if not is_multiprocess():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
