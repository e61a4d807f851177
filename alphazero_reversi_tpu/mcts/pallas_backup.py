"""Pallas TPU kernel for the fused MCTS backup+link.

Replaces the XLA scatter-add in ``tree.backup_and_link`` on TPU. Why a
kernel (measured, see PERF.md): XLA lowers the per-game scatter-add to a
masked full pass over the stats array *and* forces a layout conversion of
the loop carry each simulation round; a Pallas kernel fixes the layout
(row-major blocks), updates in place (``input_output_aliases``), and
touches only the ~path-length node rows per game inside VMEM. Isolated
cost at B=1024, N=401: 2.9 ms vs 5.2 ms for the scatter (carry included);
exact-equal outputs (the update sets are disjoint cells or exact small
ints, so f32 order cannot matter — asserted in tests).

Mosaic constraints that shape the code (discovered by probing this
toolchain; kept as guidance for future kernels):

* dynamic indices are allowed on *sublane* dims only — dynamic lane
  offsets must be 128-aligned. Hence stats are viewed ``[B, N, S]`` with
  the node index on the sublane dim and cell updates done as whole-row
  one-hot adds.
* scalar stores go to SMEM refs; path indices arrive as SMEM blocks.
* an aliased output block starts UNINITIALIZED (aliasing shares the HBM
  buffer, not the VMEM block): the kernel must copy the input block
  through before read-modify-writes.
* vector int<->float casts (``sitofp``) do not legalize; comparisons are
  done in int space and float constants come in as operands.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..env import bitboard as env

A = env.NUM_ACTIONS
S = 2 * A
VISITS_OFF = 0
VSUM_OFF = A


def _backup_kernel(pack_ref, pn_ref, pa_ref, inc_ref, link_ref,
                   stats_ref, out_ref):
    """One game-chunk: sequential whole-row RMW per path level.

    pack_ref: [1, 1] SMEM (the visits packing base, passed not captured);
    pn/pa/inc: [G, L] SMEM; link: [G, 3] SMEM (node, action, slot|-1);
    stats_ref -> out_ref aliased [G, N, S] VMEM.
    """
    G, L = pn_ref.shape
    pack = pack_ref[0, 0]
    out_ref[:, :, :] = stats_ref[:, :, :]
    for g in range(G):
        for l in range(L):
            node = pn_ref[g, l]
            a_i = pa_ref[g, l]
            inc = inc_ref[g, l]

            @pl.when(node >= 0)
            def _():
                n = jnp.maximum(node, 0)
                row = out_ref[g, n, :]
                iot = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)[0, :]
                upd = (jnp.where(iot == a_i + VISITS_OFF, pack, 0.0) +
                       jnp.where(iot == a_i + VSUM_OFF, inc, 0.0))
                out_ref[g, n, :] = row + upd

        lnode = link_ref[g, 0]
        laction = link_ref[g, 1]
        lslot = link_ref[g, 2]

        @pl.when(lslot >= 0)
        def _():
            n = jnp.maximum(lnode, 0)
            row = out_ref[g, n, :]
            iot = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)[0, :]
            upd = jnp.where(iot == laction + VISITS_OFF,
                            lslot.astype(jnp.float32), 0.0)
            out_ref[g, n, :] = row + upd


@functools.partial(jax.jit, static_argnames=("games_per_block", "interpret"))
def backup_and_link_tpu(stats_flat: jax.Array, pack: jax.Array,
                        nodes: jax.Array, actions: jax.Array,
                        value_incs: jax.Array, link: jax.Array,
                        games_per_block: int = 8,
                        interpret: bool = False) -> jax.Array:
    """stats [B, N*S] f32 -> updated stats, via the in-place kernel.

    ``link`` is [B, 3] int32 (node, action, slot-or-negative). The flat->3-D
    view is a pure bitcast (row-major contiguous), not a relayout.
    """
    B = stats_flat.shape[0]
    N = stats_flat.shape[1] // S
    G = games_per_block
    L = nodes.shape[1]
    stats3 = stats_flat.reshape(B, N, S)
    smem = lambda cols: pl.BlockSpec((G, cols), lambda i: (i, 0),
                                     memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        _backup_kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, S), jnp.float32),
        grid=(B // G,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  smem(L), smem(L), smem(L), smem(3),
                  pl.BlockSpec((G, N, S), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, N, S), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        input_output_aliases={5: 0},
        interpret=interpret,
    )(pack.reshape(1, 1), nodes, actions, value_incs, link, stats3)
    return out.reshape(B, N * S)


def enabled(batch: int, games_per_block: int = 8) -> bool:
    """Kernel dispatch guard.

    OFF by default: isolated the kernel beats the XLA scatter 2.9 vs
    5.2 ms, but END-TO-END the search measures 550 moves/s with it vs 591
    without (B=1024, flagship, staged) — inside the full program XLA
    overlaps the scatter with other round work and the kernel's fixed
    row-major layout forces conversions on the select side's gathers.
    Kept buildable/tested (set ``AZR_PALLAS_BACKUP=1``) as the starting
    point for a future fully-fused round kernel; honest-measurement
    details in PERF.md.
    """
    import os
    if os.environ.get("AZR_PALLAS_BACKUP", "0") != "1":
        return False
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    return backend == "tpu" and batch % games_per_block == 0
