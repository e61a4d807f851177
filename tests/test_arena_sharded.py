"""Mesh-sharded evaluation arena (VERDICT r4 item 1) on the virtual
8-device CPU mesh.

The arena was the last phase with zero intra-process device parallelism:
``play_pair`` now carries the two color-halves as independent state
batches, each constrained to the mesh's ``data`` axis, so every per-ply
search is a full-mesh SPMD computation. These tests pin down the three
"done" criteria: sharded ≡ unsharded equivalence at a fixed key, a
compile-level assertion that the game batch is actually split (per-device
FLOPs shrink ~1/d; the HLO has no collectives), and the Arena/tournament
wiring."""
import re

import jax
import numpy as np
import pytest

from alphazero_reversi_tpu import arena as arena_lib
from alphazero_reversi_tpu.config import ModelConfig, TournamentConfig
from alphazero_reversi_tpu.models import resnet
from alphazero_reversi_tpu.parallel import mesh as mesh_lib


@pytest.fixture(scope="module")
def net_and_vars():
    cfg = ModelConfig(num_res_blocks=1, num_filters=8,
                      value_head_hidden_size=16, compute_dtype="float32")
    net = resnet.build_network(cfg)
    return net, resnet.init_variables(net, jax.random.PRNGKey(0))


KWARGS = dict(num_simulations=4, c_puct=1.0, temperature=0.1,
              max_depth=4, max_moves=12)


def test_sharded_play_pair_matches_unsharded(net_and_vars):
    """Sharding is a placement decision, not a math change: identical keys
    must give identical per-game scores (both halves divide the 8-device
    data axis here)."""
    net, variables = net_and_vars
    m = mesh_lib.make_mesh()
    vars_b = resnet.init_variables(net, jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(5)
    plain = np.asarray(arena_lib.play_pair(
        net, variables, vars_b, key, num_games=16, **KWARGS))
    sharded = np.asarray(arena_lib.play_pair(
        net, mesh_lib.replicate(m, variables),
        mesh_lib.replicate(m, vars_b), key, num_games=16, mesh=m, **KWARGS))
    np.testing.assert_array_equal(plain, sharded)


def test_sharded_play_pair_single_color_unit(net_and_vars):
    """The sharded tournament's single-color units (black_games override)
    must also shard and agree with the unsharded run."""
    net, variables = net_and_vars
    m = mesh_lib.make_mesh()
    key = jax.random.PRNGKey(7)
    for bg in (8, 0):
        plain = np.asarray(arena_lib.play_pair(
            net, variables, None, key, num_games=8, b_random=True,
            black_games=bg, **KWARGS))
        sharded = np.asarray(arena_lib.play_pair(
            net, mesh_lib.replicate(m, variables), None, key, num_games=8,
            b_random=True, black_games=bg, mesh=m, **KWARGS))
        np.testing.assert_array_equal(plain, sharded)


def test_sharded_play_pair_indivisible_half_falls_back(net_and_vars):
    """A half that doesn't divide the data axis replicates (correct, just
    redundant) instead of crashing — and still matches unsharded."""
    net, variables = net_and_vars
    m = mesh_lib.make_mesh()
    key = jax.random.PRNGKey(9)
    plain = np.asarray(arena_lib.play_pair(
        net, variables, None, key, num_games=6, b_random=True, **KWARGS))
    sharded = np.asarray(arena_lib.play_pair(
        net, mesh_lib.replicate(m, variables), None, key, num_games=6,
        b_random=True, mesh=m, **KWARGS))
    np.testing.assert_array_equal(plain, sharded)


def test_sharded_play_pair_hlo_split_and_collective_free(net_and_vars):
    """Compile-level proof that the game batch is actually split, not
    replicated (VERDICT r4 weak 2 'its correctness rests on GSPMD placement
    rules nobody asserts'):

    * the optimized (per-device) HLO contains NO cross-shard collectives —
      the eval search has the same zero-communication property as sharded
      self-play;
    * per-device FLOPs of the sharded program are a small fraction of the
      unsharded program's (the search work really divides 8 ways).
    """
    net, variables = net_and_vars
    m = mesh_lib.make_mesh()
    vr = mesh_lib.replicate(m, variables)
    key = jax.random.PRNGKey(0)

    def compiled(mesh, vs):
        return arena_lib._play_pair_parts.lower(
            net, vs, vs, key, num_games=16, mesh=mesh, **KWARGS).compile()

    sharded = compiled(m, vr)
    hlo = sharded.as_text()
    found = sorted(set(re.findall(
        r"all-reduce|all-gather|collective-permute|all-to-all"
        r"|reduce-scatter|collective-broadcast", hlo)))
    assert not found, f"sharded eval compiled with collectives: {found}"

    flops_sharded = sharded.cost_analysis()["flops"]
    flops_plain = compiled(None, variables).cost_analysis()["flops"]
    # perfect split would be 1/8; allow generous slack for replicated
    # odds-and-ends (score reduction, tiny gathers)
    assert flops_sharded < flops_plain / 4, (
        f"sharded per-device flops {flops_sharded:.3g} not < 1/4 of "
        f"unsharded {flops_plain:.3g} — batch not actually split")


def test_arena_tournament_with_mesh_matches_unsharded(net_and_vars):
    """Arena(mesh=...) must reproduce the unsharded tournament leaderboard
    bit-exactly (same keys, same unit decomposition, same ELO replay)."""
    net, variables = net_and_vars
    cfg = TournamentConfig(rounds=1, num_simulations=4, games_per_pair=16,
                           temperature=0.1)

    def run(mesh):
        ar = arena_lib.Arena(net, cfg, mesh=mesh)
        ar.add_player("model", variables)
        ar.add_player("random", None)
        return ar.run_tournament_sharded(jax.random.PRNGKey(11))

    plain = run(None)
    sharded = run(mesh_lib.make_mesh())
    assert [p["player_id"] for p in plain] == \
        [p["player_id"] for p in sharded]
    for pp, ps in zip(plain, sharded):
        assert pp["rating"] == ps["rating"]
        assert pp["games_played"] == ps["games_played"]


def test_arena_nulls_trivial_mesh(net_and_vars):
    """A 1-device data axis is not a sharding: Arena must treat it as
    unsharded (mesh=None) so the jit cache key stays stable."""
    net, _ = net_and_vars
    m1 = mesh_lib.make_mesh(devices=jax.devices()[:1])
    ar = arena_lib.Arena(net, TournamentConfig(), mesh=m1)
    assert ar.mesh is None


def test_local_mesh_covers_local_devices():
    m = mesh_lib.local_mesh()
    assert m.shape[mesh_lib.DATA_AXIS] == len(jax.local_devices())
    assert m.shape[mesh_lib.MODEL_AXIS] == 1
