"""Arena/ELO tests — ELO math and tournament coverage the reference lacked
(SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_reversi_tpu import arena as arena_lib
from alphazero_reversi_tpu import elo as elo_lib
from alphazero_reversi_tpu.config import ModelConfig, TournamentConfig
from alphazero_reversi_tpu.models import resnet


def test_elo_expected_score_symmetry():
    elo = elo_lib.ELORatingSystem(k=32, initial_rating=1200)
    assert elo.get_expected_score(1200, 1200) == pytest.approx(0.5)
    e = elo.get_expected_score(1400, 1200)
    assert e == pytest.approx(1.0 - elo.get_expected_score(1200, 1400))
    # 400-point gap => ~0.909 (standard ELO table)
    assert elo.get_expected_score(1600, 1200) == pytest.approx(
        10 / 11, abs=1e-6)


def test_elo_update_zero_sum_and_k():
    elo = elo_lib.ELORatingSystem(k=32, initial_rating=1200)
    rec = elo.update_ratings("a", "b", 1.0)
    assert elo.ratings["a"] == pytest.approx(1216.0)
    assert elo.ratings["b"] == pytest.approx(1184.0)
    assert rec["rating_a_after"] + rec["rating_b_after"] == pytest.approx(2400.0)
    assert elo.games_played == {"a": 1, "b": 1}


def test_elo_json_roundtrip(tmp_path):
    elo = elo_lib.ELORatingSystem(k=16, initial_rating=1000)
    elo.update_ratings("x", "y", 0.5)
    path = str(tmp_path / "elo.json")
    elo.save_ratings(path)
    loaded = elo_lib.ELORatingSystem.load_ratings(path)
    assert loaded.k == 16
    assert loaded.ratings == pytest.approx(elo.ratings)
    assert loaded.games_played == elo.games_played
    assert len(loaded.history) == 1


def test_leaderboard_sorted():
    elo = elo_lib.ELORatingSystem()
    elo.add_player("low", 1000)
    elo.add_player("high", 1500)
    elo.add_player("mid", 1250)
    board = elo.get_leaderboard()
    assert [p["player_id"] for p in board] == ["high", "mid", "low"]


@pytest.fixture(scope="module")
def net_and_vars():
    cfg = ModelConfig(num_res_blocks=1, num_filters=8,
                      value_head_hidden_size=16, compute_dtype="float32")
    net = resnet.build_network(cfg)
    return net, resnet.init_variables(net, jax.random.PRNGKey(0))


def test_random_vs_random_match(net_and_vars):
    net, _ = net_and_vars
    scores = arena_lib.play_pair(
        net, None, None, jax.random.PRNGKey(1), num_games=8,
        num_simulations=4, c_puct=1.0, temperature=1.0,
        a_random=True, b_random=True)
    scores = np.asarray(scores)
    assert scores.shape == (8,)
    assert set(np.unique(scores)).issubset({0.0, 0.5, 1.0})


def test_mcts_vs_random_match(net_and_vars):
    net, variables = net_and_vars
    scores = arena_lib.play_pair(
        net, variables, None, jax.random.PRNGKey(2), num_games=4,
        num_simulations=8, c_puct=1.0, temperature=0.1,
        b_random=True)
    assert np.asarray(scores).shape == (4,)


def test_asymmetric_search_settings(net_and_vars):
    """Per-side search settings (handicap/ablation matches —
    refbench/leafbatch_quality.py). Defaults must reproduce the symmetric
    arena exactly; asymmetric settings must run and score validly."""
    net, variables = net_and_vars
    kwargs = dict(num_games=4, num_simulations=8, c_puct=1.0,
                  temperature=0.0, max_moves=16)
    base = np.asarray(arena_lib.play_pair(
        net, variables, variables, jax.random.PRNGKey(3), **kwargs))
    explicit = np.asarray(arena_lib.play_pair(
        net, variables, variables, jax.random.PRNGKey(3),
        num_simulations_b=8, leaf_batch=1, leaf_batch_b=1, **kwargs))
    np.testing.assert_array_equal(base, explicit)

    asym = np.asarray(arena_lib.play_pair(
        net, variables, variables, jax.random.PRNGKey(3),
        num_simulations_b=4, leaf_batch=2, leaf_batch_b=1, **kwargs))
    assert asym.shape == (4,)
    assert set(np.unique(asym)).issubset({0.0, 0.5, 1.0})


def test_phased_matches_lockstep_when_deterministic(net_and_vars):
    """The mover-only phased arena (VERDICT item 8: half the search cost)
    must produce identical game outcomes to the round-1 both-searches
    lockstep arena under deterministic play: temperature ~0 makes every
    search argmax-deterministic given the state, so per-game trajectories
    coincide ply for ply."""
    net, variables = net_and_vars
    vars_b = resnet.init_variables(net, jax.random.PRNGKey(7))
    kwargs = dict(num_games=8, num_simulations=8, c_puct=1.0,
                  temperature=0.0)
    phased = np.asarray(arena_lib.play_pair(
        net, variables, vars_b, jax.random.PRNGKey(5), **kwargs))
    lockstep = np.asarray(arena_lib.play_pair_lockstep(
        net, variables, vars_b, jax.random.PRNGKey(11), **kwargs))
    np.testing.assert_array_equal(phased, lockstep)


def test_phased_stall_realigns_on_pass():
    """A game where an auto-pass gives one color two plies in a row must
    stall exactly one ply and keep advancing (the pass_slack mechanism)."""
    # random-vs-random with a generous ply budget: every game must reach a
    # terminal position (done=True) well before the cap, passes included.
    scores, final = arena_lib.play_pair(
        None, None, None, jax.random.PRNGKey(9), num_games=64,
        num_simulations=1, c_puct=1.0, temperature=1.0,
        a_random=True, b_random=True, pass_slack=16, return_final=True)
    scores = np.asarray(scores)
    assert scores.shape == (64,)
    assert set(np.unique(scores)).issubset({0.0, 0.5, 1.0})
    # every game reached a true terminal position: any pass-stalled games
    # realigned and caught up within the slack budget
    assert bool(np.asarray(final.done).all())
    # both colors must win sometimes over 64 random games
    assert scores.min() == 0.0 and scores.max() == 1.0


def test_tournament_updates_all_players(net_and_vars):
    net, variables = net_and_vars
    cfg = TournamentConfig(rounds=1, num_simulations=4, games_per_pair=2,
                           temperature=1.0)
    ar = arena_lib.Arena(net, cfg)
    ar.add_player("model", variables)
    ar.add_player("random", None)
    board = ar.run_tournament(jax.random.PRNGKey(3), rounds=1)
    assert {p["player_id"] for p in board} == {"model", "random"}
    assert all(p["games_played"] == 2 for p in board)
    # zero-sum: total rating conserved
    total = sum(p["rating"] for p in board)
    assert total == pytest.approx(2 * cfg.elo_initial)


def test_save_results(net_and_vars, tmp_path):
    net, _ = net_and_vars
    cfg = TournamentConfig(rounds=1, num_simulations=4, games_per_pair=2)
    ar = arena_lib.Arena(net, cfg)
    ar.add_player("r1", None)
    ar.add_player("r2", None)
    ar.run_tournament(jax.random.PRNGKey(4), rounds=1)
    path = str(tmp_path / "results.json")
    ar.save_results(path)
    loaded = elo_lib.ELORatingSystem.load_ratings(path)
    assert set(loaded.ratings) == {"r1", "r2"}


def test_batch_rounds_exact_count_and_elo_order(net_and_vars, monkeypatch):
    """batch_rounds must (a) play EXACTLY rounds*games_per_pair games per
    pairing even when that product is odd (the even-batch filler game's
    score is discarded), and (b) apply per-game ELO updates in the same
    round-interleaved order as the non-batched path — ELO updates are
    path-dependent, so with 3+ players a different order changes the
    leaderboard. Verified by stubbing play_games with deterministic
    per-(pair, game-index) scores so both modes see identical results."""
    net, variables = net_and_vars

    def fake_scores(pair_key, k):
        return ((hash(pair_key) % 5) + 3 * k) % 3 / 2.0

    def make_fake(counter):
        def fake_play_games(self, a, b, key, num_games):
            names = tuple(sorted((a.name, b.name)))
            start = counter.get(names, 0)
            counter[names] = start + num_games
            s = np.asarray([fake_scores(names, start + k)
                            for k in range(num_games)])
            return s if a.name == names[0] else 1.0 - s
        return fake_play_games

    def run(batch: bool):
        counter: dict = {}
        monkeypatch.setattr(arena_lib.Arena, "play_games",
                            make_fake(counter))
        cfg = TournamentConfig(rounds=3, num_simulations=2,
                               games_per_pair=1, batch_rounds=batch)
        ar = arena_lib.Arena(net, cfg)
        for name in ("p0", "p1", "p2"):
            ar.add_player(name, variables)
        board = ar.run_tournament(jax.random.PRNGKey(5))
        return board, counter

    board_b, counter_b = run(True)
    board_s, counter_s = run(False)
    # rounds*games_per_pair = 3 (odd): each pairing plays exactly 3
    # counted games in both modes (the batched mode's filler game is
    # requested but its score discarded)
    assert all(p["games_played"] == 6 for p in board_b)  # 2 pairings each
    assert all(p["games_played"] == 6 for p in board_s)
    # identical per-game results + identical update order => identical
    # final ratings, not merely close ones
    ratings_b = {p["player_id"]: p["rating"] for p in board_b}
    ratings_s = {p["player_id"]: p["rating"] for p in board_s}
    assert ratings_b == pytest.approx(ratings_s)


def test_batch_rounds_tournament(net_and_vars):
    """TournamentConfig.batch_rounds: all rounds of a pairing in one
    batched call — same total game count and per-game ELO updates, fewer
    dispatches."""
    net, variables = net_and_vars
    cfg = TournamentConfig(rounds=3, num_simulations=4, games_per_pair=2,
                           temperature=1.0, batch_rounds=True)
    ar = arena_lib.Arena(net, cfg)
    ar.add_player("model", variables)
    ar.add_player("random", None)
    board = ar.run_tournament(jax.random.PRNGKey(9))
    assert {p["player_id"] for p in board} == {"model", "random"}
    # 3 rounds x 2 games per pair = 6 games each
    assert all(p["games_played"] == 6 for p in board)
    total = sum(p["rating"] for p in board)
    assert total == pytest.approx(2 * cfg.elo_initial)


def test_play_pair_black_games_override(net_and_vars):
    """play_pair(black_games=...) single-color and asymmetric splits run
    and score in {0, 0.5, 1} (the sharded tournament's work units)."""
    net, _ = net_and_vars
    for ng, bg in ((3, 3), (3, 0), (5, 2)):
        scores = np.asarray(arena_lib.play_pair(
            net, None, None, jax.random.PRNGKey(11), num_games=ng,
            num_simulations=2, c_puct=1.0, temperature=1.0,
            a_random=True, b_random=True, max_depth=4,
            black_games=bg))
        assert scores.shape == (ng,)
        assert set(np.unique(scores)) <= {0.0, 0.5, 1.0}
    with pytest.raises(ValueError):
        arena_lib.play_pair(
            net, None, None, jax.random.PRNGKey(11), num_games=3,
            num_simulations=2, c_puct=1.0, temperature=1.0,
            a_random=True, b_random=True, max_depth=4, black_games=4)


def test_sharded_tournament_invariant_to_shard_count(net_and_vars):
    """run_tournament_sharded must produce the IDENTICAL leaderboard for
    any shard layout (VERDICT r3 item 3): the unit list and keys are
    canonical, so playing shard 0 and shard 1 on separate Arena instances
    and merging their scores equals the single-shard run exactly."""
    net, variables = net_and_vars

    def make_arena():
        cfg = TournamentConfig(rounds=2, num_simulations=2,
                               games_per_pair=2, temperature=1.0)
        ar = arena_lib.Arena(net, cfg)
        ar.add_player("current", variables)
        ar.add_player("best", variables)
        ar.add_player("random", None)
        return ar

    key = jax.random.PRNGKey(13)
    full_arena = make_arena()
    full = full_arena.run_tournament_sharded(key)  # shard_count=1
    # 3 pairings x 2 color-halves = 6 units, all played by the one shard
    assert full_arena.units_played == list(range(6))

    # simulate two processes: shard 1 records its local rows, shard 0
    # merges them in via the gather hook (what multihost.gather_unit_scores
    # does with a real allgather)
    captured = {}

    def record_gather(scores, owners):
        captured["rows"] = scores.copy()
        return scores

    a1 = make_arena()
    a1.run_tournament_sharded(key, shard_index=1, shard_count=2,
                              gather=record_gather)
    assert a1.units_played == [1, 3, 5]

    def merge_gather(scores, owners):
        return np.where((owners % 2 == 0)[:, None], scores,
                        captured["rows"])

    a0 = make_arena()
    merged = a0.run_tournament_sharded(key, shard_index=0, shard_count=2,
                                       gather=merge_gather)
    assert a0.units_played == [0, 2, 4]

    assert [p["player_id"] for p in merged] == \
        [p["player_id"] for p in full]
    for pm, pf in zip(merged, full):
        assert pm["rating"] == pytest.approx(pf["rating"])
        assert pm["games_played"] == pf["games_played"]


def test_sharded_tournament_game_counts_match_batch_rounds(net_and_vars):
    """The sharded decomposition plays exactly rounds*games_per_pair games
    per pairing, including odd totals (black half gets the extra game)."""
    net, variables = net_and_vars
    cfg = TournamentConfig(rounds=3, num_simulations=2, games_per_pair=1,
                           temperature=1.0)
    ar = arena_lib.Arena(net, cfg)
    ar.add_player("model", variables)
    ar.add_player("random", None)
    units = ar._tournament_units(jax.random.PRNGKey(0), cfg.rounds)
    assert [(u[2], u[3]) for u in units] == [(2, 2), (1, 0)]
    board = ar.run_tournament_sharded(jax.random.PRNGKey(0))
    assert all(p["games_played"] == 3 for p in board)
