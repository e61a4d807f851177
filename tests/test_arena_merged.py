"""Merged-pairings tournament execution (`arena._play_units_parts`) — the
PERF.md r5 "merge the gate's pairings into one program" lever.

The merged program must be a pure EXECUTION change: the unit decomposition,
per-unit RNG streams, score layout, and ELO replay are those of
``run_tournament_sharded``, so per-unit results must match standalone
``play_pair(black_games=...)`` runs bit-exactly for random players (whose
probs don't depend on batching) and for deterministic play (arena searches
are key-free: noise-free PUCT / gumbel_scale=0)."""
import re

import jax
import numpy as np
import pytest

from alphazero_reversi_tpu import arena as arena_lib
from alphazero_reversi_tpu.config import ModelConfig, TournamentConfig
from alphazero_reversi_tpu.env import bitboard as env
from alphazero_reversi_tpu.models import resnet
from alphazero_reversi_tpu.parallel import mesh as mesh_lib


@pytest.fixture(scope="module")
def net_and_vars():
    cfg = ModelConfig(num_res_blocks=1, num_filters=8,
                      value_head_hidden_size=16, compute_dtype="float32")
    net = resnet.build_network(cfg)
    return net, resnet.init_variables(net, jax.random.PRNGKey(0))


KW = dict(num_simulations=4, c_puct=1.0, max_depth=4, max_moves=12)

GATE_UNITS = [(0, 1, 4, int(env.BLACK)), (0, 1, 4, int(env.WHITE)),
              (0, 2, 4, int(env.BLACK)), (0, 2, 4, int(env.WHITE)),
              (1, 2, 4, int(env.BLACK)), (1, 2, 4, int(env.WHITE))]


def _unit_keys(seed, n):
    return [jax.random.fold_in(jax.random.PRNGKey(seed), i)
            for i in range(n)]


def test_merged_units_match_play_pair_random():
    """Random-vs-random units: probs are exact (legal/count) regardless of
    batching and sampling keys replicate per unit, so the merged program is
    BIT-IDENTICAL to per-unit play_pair — including ragged game counts and
    A-as-WHITE units."""
    units = [(0, 1, 5, int(env.BLACK)), (0, 1, 5, int(env.WHITE)),
             (0, 1, 3, int(env.BLACK)), (1, 0, 4, int(env.WHITE))]
    keys = _unit_keys(7, len(units))
    merged = arena_lib.play_units(None, (None, None), units, keys,
                                  random_mask=(True, True),
                                  temperature=1.0, **KW)
    for (a, b, n, col), k, s in zip(units, keys, merged):
        ref = np.asarray(arena_lib.play_pair(
            None, None, None, k, num_games=n, a_random=True, b_random=True,
            temperature=1.0, black_games=(n if col == env.BLACK else 0),
            **KW))
        np.testing.assert_array_equal(s, ref)


def test_merged_units_match_play_pair_deterministic(net_and_vars):
    """The 3-player gate's 6 units with net players at temperature 0:
    searches are state-deterministic, so merged outcomes equal per-unit
    play_pair outcomes — with and without tree reuse."""
    net, v0 = net_and_vars
    v1 = resnet.init_variables(net, jax.random.PRNGKey(1))
    models = (v0, v1, None)
    keys = _unit_keys(13, len(GATE_UNITS))
    for reuse_kw in (dict(),
                     dict(tree_reuse="root", tree_reuse_discount=0.25)):
        merged = arena_lib.play_units(
            net, models, GATE_UNITS, keys,
            random_mask=(False, False, True), temperature=0.0,
            **reuse_kw, **KW)
        for (a, b, n, col), k, s in zip(GATE_UNITS, keys, merged):
            ref = np.asarray(arena_lib.play_pair(
                net, models[a], models[b], k, num_games=n,
                a_random=models[a] is None, b_random=models[b] is None,
                temperature=0.0,
                black_games=(n if col == env.BLACK else 0),
                **reuse_kw, **KW))
            np.testing.assert_array_equal(s, ref)


def test_merged_search_instances_halve(net_and_vars):
    """The point of merging is FEWER SEARCH INSTANCES at larger batch, not
    fewer FLOPs: game-searches per ply are identical (the gate's 4
    per-half-ply net-mover searches at B=4 become 2 at B=8), but each
    search's per-round fixed costs — flat in B (PERF.md) — are paid half
    as often. Compile-level form: the merged program contains ~half the
    convolution INSTANCES of the three per-pairing programs' sum (each
    instance at 2x batch), while total FLOPs stay ~equal (merging must not
    add work)."""
    net, v0 = net_and_vars
    v1 = resnet.init_variables(net, jax.random.PRNGKey(1))
    models = (v0, v1, None)
    keys = _unit_keys(17, len(GATE_UNITS))
    merged = arena_lib._play_units_parts.lower(
        net, models, jax.numpy.stack(keys), units=tuple(GATE_UNITS),
        random_mask=(False, False, True), temperature=0.0,
        **KW).compile()
    merged_flops = merged.cost_analysis()["flops"]
    merged_convs = merged.as_text().count("convolution")
    total_flops, total_convs = 0.0, 0
    for (a, b), rand_b in (((0, 1), False), ((0, 2), True), ((1, 2), True)):
        c = arena_lib._play_pair_parts.lower(
            net, models[a], models[b], keys[0], num_games=8,
            b_random=rand_b, temperature=0.0, **KW).compile()
        total_flops += c.cost_analysis()["flops"]
        total_convs += c.as_text().count("convolution")
    assert merged_convs <= 0.6 * total_convs, (
        f"merged conv instances {merged_convs} not <= 0.6x separate sum "
        f"{total_convs} — searches not actually shared across pairings")
    assert merged_flops <= 1.1 * total_flops, (
        f"merged flops {merged_flops:.3g} exceed separate sum "
        f"{total_flops:.3g} by >10% — merging added work")


def test_merged_sharded_collective_free(net_and_vars):
    """On the 8-device mesh the merged program keeps the arena's
    compile-level properties: no collectives, and the per-device FLOPs
    actually shrink vs the unsharded merged program."""
    net, v0 = net_and_vars
    v1 = resnet.init_variables(net, jax.random.PRNGKey(1))
    m = mesh_lib.make_mesh()
    units = [(0, 1, 8, int(env.BLACK)), (0, 1, 8, int(env.WHITE)),
             (0, 2, 8, int(env.BLACK)), (1, 2, 8, int(env.WHITE))]
    keys = jax.numpy.stack(_unit_keys(19, len(units)))

    def compiled(mesh, mv):
        return arena_lib._play_units_parts.lower(
            net, mv, keys, units=tuple(units),
            random_mask=(False, False, True), temperature=0.0, mesh=mesh,
            **KW).compile()

    sharded = compiled(m, tuple(mesh_lib.replicate(m, v) if v is not None
                                else None for v in (v0, v1, None)))
    hlo = sharded.as_text()
    found = sorted(set(re.findall(
        r"all-reduce|all-gather|collective-permute|all-to-all"
        r"|reduce-scatter|collective-broadcast", hlo)))
    assert not found, f"merged sharded eval has collectives: {found}"
    flops_sharded = sharded.cost_analysis()["flops"]
    flops_plain = compiled(None, (v0, v1, None)).cost_analysis()["flops"]
    assert flops_sharded < flops_plain / 4


def test_tournament_merge_pairings_matches_unmerged(net_and_vars):
    """Arena-level: merge_pairings=True must reproduce the sharded/unmerged
    tournament leaderboard bit-exactly at deterministic play (same units,
    same keys, same ELO replay — only the execution batching differs)."""
    net, v0 = net_and_vars

    def make(merge):
        cfg = TournamentConfig(rounds=2, num_simulations=2,
                               games_per_pair=2, temperature=0.0,
                               merge_pairings=merge)
        ar = arena_lib.Arena(net, cfg)
        ar.add_player("current", v0)
        ar.add_player("best", v0)
        ar.add_player("random", None)
        return ar

    ar_m = make(True)
    merged = ar_m.run_tournament(jax.random.PRNGKey(23))
    # merge_pairings routes run_tournament through the sharded
    # decomposition; compare against the explicit unmerged sharded run
    ar_s = make(False)
    plain = ar_s.run_tournament_sharded(jax.random.PRNGKey(23))
    assert [p["player_id"] for p in merged] == \
        [p["player_id"] for p in plain]
    for pm, pp in zip(merged, plain):
        assert pm["rating"] == pp["rating"]
        assert pm["games_played"] == pp["games_played"]
    # all 6 gate units played by the single shard
    assert ar_m.units_played == list(range(6))


def test_merged_shard_subset_plays_only_owned_units(net_and_vars):
    """Multi-process composition: a shard with merge_pairings plays ONLY
    its units (merged into one program) and fills only its score rows."""
    net, v0 = net_and_vars
    cfg = TournamentConfig(rounds=1, num_simulations=2, games_per_pair=2,
                           temperature=1.0, merge_pairings=True)
    ar = arena_lib.Arena(net, cfg)
    ar.add_player("a", None)
    ar.add_player("b", None)
    ar.add_player("c", None)
    captured = {}

    def record_gather(scores, owners):
        captured["rows"] = scores.copy()
        return scores

    ar.run_tournament_sharded(jax.random.PRNGKey(29), shard_index=1,
                              shard_count=2, gather=record_gather)
    assert ar.units_played == [1, 3, 5]
    rows = captured["rows"]
    assert np.all(rows[::2] == 0)  # unowned rows untouched
    # owned rows contain real scores in {0, 0.5, 1}
    assert set(np.unique(rows[1::2])) <= {0.0, 0.5, 1.0}


def test_play_units_rejects_bad_units():
    with pytest.raises(ValueError):
        arena_lib.play_units(None, (None,), [(0, 0, 0, int(env.BLACK))],
                             [jax.random.PRNGKey(0)], random_mask=(True,),
                             temperature=1.0, **KW)
    with pytest.raises(ValueError):
        arena_lib.play_units(None, (None,), [(0, 1, 2, int(env.BLACK))],
                             [jax.random.PRNGKey(0)], random_mask=(True,),
                             temperature=1.0, **KW)
