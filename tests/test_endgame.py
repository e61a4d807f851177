"""Exact endgame solver tests (native/solver.cpp via env/endgame.py).

No reference counterpart — the reference plays endgames from MCTS
statistics alone. The invariants here are game-theoretic: the solver's
value matches exhaustive negamax on small endgames (both rule modes,
including the compat quirks), optimal lines are self-consistent (playing
the solver against itself realizes exactly the root value), and the MCTS
host path plays the solved move when configured."""
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_reversi_tpu.config import MCTSConfig, ModelConfig
from alphazero_reversi_tpu.env import bitboard as env
from alphazero_reversi_tpu.env import endgame
from alphazero_reversi_tpu.env import oracle as oracle_lib
from alphazero_reversi_tpu.mcts import search as mcts_search
from alphazero_reversi_tpu.models import resnet
from alphazero_reversi_tpu.ops import u64


def brute_force(black, white, to_move, passed, mode):
    """Exhaustive negamax over the oracle's rules: the trusted slow answer."""
    b = oracle_lib.OracleBoard(mode)
    b.set_position(black, white, to_move, passed)
    legal = b.legal_moves_bb()
    mine, theirs = (black, white) if to_move == 1 else (white, black)
    if legal == 0:
        opp = oracle_lib.OracleBoard(mode)
        opp.set_position(black, white, 3 - to_move)
        if passed or opp.legal_moves_bb() == 0:
            return bin(mine).count("1") - bin(theirs).count("1")
        return -brute_force(black, white, 3 - to_move, 1, mode)
    best = -127
    for sq in range(64):
        if legal >> sq & 1:
            c = oracle_lib.OracleBoard(mode)
            c.set_position(black, white, to_move)
            f = c.flips(sq)
            nm, nt = mine | (1 << sq) | f, theirs & ~f
            nb, nw = (nm, nt) if to_move == 1 else (nt, nm)
            best = max(best, -brute_force(nb, nw, 3 - to_move, 0, mode))
    return best


def random_endgame(empties_target, mode, seed):
    """Play random moves until at most `empties_target` squares are empty
    (or the game ends). Returns the OracleBoard."""
    rng = random.Random(seed)
    b = oracle_lib.OracleBoard(mode)
    while (not b.game_over
           and 64 - bin(b.black | b.white).count("1") > empties_target):
        legal = b.legal_moves_bb()
        if legal == 0:
            b.step(oracle_lib.PASS_ACTION)
            continue
        b.step(rng.choice([i for i in range(64) if legal >> i & 1]))
    return b


@pytest.mark.parametrize("mode", [oracle_lib.MODE_CORRECT,
                                  oracle_lib.MODE_COMPAT])
def test_solver_matches_bruteforce(mode):
    solver = endgame.EndgameSolver(compat=(mode == oracle_lib.MODE_COMPAT))
    checked = 0
    for seed in range(6):
        b = random_endgame(6, mode, 300 + seed)
        if b.game_over:
            continue
        res = solver.solve(b.black, b.white, b.current_player,
                           passed=b.passed)
        expected = brute_force(b.black, b.white, b.current_player,
                               b.passed, mode)
        assert res.value == expected, (mode, seed)
        checked += 1
    assert checked >= 3  # the sampler must actually produce live endgames


@pytest.mark.parametrize("mode", [oracle_lib.MODE_CORRECT,
                                  oracle_lib.MODE_COMPAT])
def test_optimal_line_realizes_root_value(mode):
    """Playing the solver's best move for BOTH sides from a ~12-empties
    position must end the game at exactly the root value — ties the value,
    the best move, and the rules engine together over a full line."""
    solver = endgame.EndgameSolver(compat=(mode == oracle_lib.MODE_COMPAT))
    for seed in (11, 12):
        b = random_endgame(12, mode, seed)
        if b.game_over:
            continue
        root_player = b.current_player
        root = solver.solve(b.black, b.white, root_player, passed=b.passed)
        while not b.game_over:
            step = solver.solve(b.black, b.white, b.current_player,
                                passed=b.passed)
            assert step.best_move != -1
            assert b.step(step.best_move), (seed, step)
        nb, nw = b.get_score()
        diff = nb - nw if root_player == 1 else nw - nb
        assert diff == root.value, seed


def test_wdl_probe_agrees_with_full_solve():
    solver = endgame.EndgameSolver()
    for seed in range(4):
        b = random_endgame(10, oracle_lib.MODE_CORRECT, 500 + seed)
        if b.game_over:
            continue
        full = solver.solve(b.black, b.white, b.current_player,
                            passed=b.passed)
        wdl = solver.solve_wdl(b.black, b.white, b.current_player,
                               passed=b.passed)
        assert np.sign(wdl.value) == np.sign(full.value), seed
        # fail-soft: the probe's bound never contradicts the exact value
        if full.value > 0:
            assert wdl.value >= 1
        elif full.value < 0:
            assert wdl.value <= -1
        else:
            assert wdl.value == 0


def test_terminal_and_forced_pass():
    solver = endgame.EndgameSolver()
    # full board: terminal, no move, diff is the raw count
    black = (1 << 40) - 1  # 40 discs
    white = ((1 << 64) - 1) ^ black  # 24 discs
    res = solver.solve(black, white, 1)
    assert res == endgame.SolveResult(16, -1, 0)
    assert solver.solve(black, white, 2).value == -16

    # black cornered at a1 with white surrounding: black to move must pass
    b = oracle_lib.OracleBoard(oracle_lib.MODE_CORRECT)
    found = None
    for seed in range(50):
        b = random_endgame(8, oracle_lib.MODE_CORRECT, 700 + seed)
        if b.game_over:
            continue
        if b.legal_moves_bb() == 0:  # random_endgame stopped pre-pass
            found = b
            break
        # construct: flip perspective — if the opponent has no moves the
        # solver must report 64 for them
        opp = oracle_lib.OracleBoard(oracle_lib.MODE_CORRECT)
        opp.set_position(b.black, b.white, 3 - b.current_player)
        if opp.legal_moves_bb() == 0:
            found = opp
            break
    if found is not None:
        res = solver.solve(found.black, found.white, found.current_player)
        assert res.best_move == 64


def test_count_empties():
    assert endgame.count_empties(0, 0) == 64
    assert endgame.count_empties(env.INITIAL_BLACK, env.INITIAL_WHITE) == 60
    assert endgame.count_empties((1 << 64) - 1, 0) == 0


def _env_state_from(board: oracle_lib.OracleBoard) -> env.EnvState:
    base = env.initial_state((1,))
    return base._replace(
        black=u64.from_int(board.black, (1,)),
        white=u64.from_int(board.white, (1,)),
        to_move=jnp.asarray([board.current_player], jnp.int32),
        passed=jnp.asarray([board.passed], jnp.int32))


@pytest.fixture(scope="module")
def net_and_vars():
    net = resnet.build_network(
        ModelConfig(num_res_blocks=1, num_filters=8, compute_dtype="float32"))
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    return net, variables


def test_mcts_plays_exact_endgame(net_and_vars):
    """With exact_endgame_empties set, the host MCTS plays the solver's
    optimal move (one-hot, ExactResult) at/below the threshold and falls
    through to tree search above it or for batched queries."""
    net, variables = net_and_vars
    solver = endgame.EndgameSolver()
    b = random_endgame(8, oracle_lib.MODE_CORRECT, 42)
    assert not b.game_over
    want = solver.solve(b.black, b.white, b.current_player, passed=b.passed)

    cfg = MCTSConfig(num_simulations=8, max_depth=4,
                     exact_endgame_empties=10)
    mcts = mcts_search.MCTS(net, variables, cfg)
    probs, result = mcts.get_action_probs(
        _env_state_from(b), jax.random.PRNGKey(0), add_noise=False)
    assert isinstance(result, mcts_search.ExactResult)
    assert int(result.chosen_action[0]) == want.best_move
    assert result.disc_diff == want.value
    assert float(np.asarray(result.root_value[0])) == np.sign(want.value)
    np_probs = np.asarray(probs)
    assert np_probs.shape == (1, env.NUM_ACTIONS)
    assert np_probs[0, want.best_move] == 1.0 and np_probs.sum() == 1.0

    # above the threshold: normal search
    cfg2 = MCTSConfig(num_simulations=8, max_depth=4,
                      exact_endgame_empties=3)
    mcts2 = mcts_search.MCTS(net, variables, cfg2)
    _, result2 = mcts2.get_action_probs(
        _env_state_from(b), jax.random.PRNGKey(0), add_noise=False)
    assert not isinstance(result2, mcts_search.ExactResult)

    # batched query: solver path requires batch 1
    batched = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x, x]), _env_state_from(b))
    _, result3 = mcts.get_action_probs(batched, jax.random.PRNGKey(0),
                                       add_noise=False)
    assert not isinstance(result3, mcts_search.ExactResult)


def test_analyze_cli_solve(tmp_path, capsys):
    """`analyze --solve N` prints the exact result when within reach."""
    from alphazero_reversi_tpu import cli
    from alphazero_reversi_tpu.config import Config

    cfg = Config()
    cfg.model.num_res_blocks = 1
    cfg.model.num_filters = 8
    cfg.model.compute_dtype = "float32"
    cfg.mcts.num_simulations = 4
    cfg.mcts.max_depth = 4
    p = str(tmp_path / "cfg.json")
    cfg.save(p)

    # opening position has 60 empties — --solve 10 must fall through to
    # search (no exact line in the output)
    rc = cli.main(["analyze", "d3", "--config", p, "--solve", "10"])
    out = capsys.readouterr().out
    assert rc == 0 and "exact endgame solve" not in out

    # drive a position into solver range via the moves argument: replay a
    # random line to <=10 empties, then analyze it with --solve
    b = random_endgame(10, oracle_lib.MODE_CORRECT, 77)
    # rebuild the move list by replaying with a fresh board
    rng = random.Random(77)
    replay = oracle_lib.OracleBoard(oracle_lib.MODE_CORRECT)
    tokens = []
    while (not replay.game_over
           and 64 - bin(replay.black | replay.white).count("1") > 10):
        legal = replay.legal_moves_bb()
        if legal == 0:
            replay.step(oracle_lib.PASS_ACTION)
            tokens.append("pass")
            continue
        sq = rng.choice([i for i in range(64) if legal >> i & 1])
        replay.step(sq)
        tokens.append(f"{sq // 8},{sq % 8}")
    assert (replay.black, replay.white) == (b.black, b.white)
    if replay.game_over:
        pytest.skip("random line ended the game before 10 empties")
    rc = cli.main(["analyze", *tokens, "--config", p, "--solve", "10"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "exact endgame solve" in out and "optimal move:" in out


def test_relabel_exact_values(net_and_vars):
    """relabel_exact_values rewrites value targets ONLY at valid positions
    with <= E empties, to the solver's WDL sign from the mover's
    perspective; all other slots and fields are untouched."""
    from alphazero_reversi_tpu import selfplay as selfplay_lib

    net, variables = net_and_vars
    traj = selfplay_lib.play_games(
        net, variables, jax.random.PRNGKey(5), num_games=4,
        num_simulations=2, c_puct=1.0, dirichlet_alpha=0.3,
        dirichlet_epsilon=0.25, temp_threshold=10, temp_init=1.0,
        temp_final=0.1, max_depth=4, max_moves=60)

    E = 12
    out = selfplay_lib.relabel_exact_values(traj, E, compat=False)

    stones = np.asarray(traj.planes[..., :2])
    empties = 64 - stones.sum((-1, -2, -3))
    valid = np.asarray(traj.valid)
    late = valid & (empties <= E)
    assert late.any(), "self-play produced no late positions to relabel"

    old_v, new_v = np.asarray(traj.value), np.asarray(out.value)
    # untouched outside the relabeled set (and all other fields identical)
    assert np.array_equal(old_v[~late], new_v[~late])
    assert np.array_equal(np.asarray(traj.policy), np.asarray(out.policy))
    assert np.array_equal(np.asarray(traj.actions), np.asarray(out.actions))

    solver = endgame.EndgameSolver()
    checked = 0
    for t, b in zip(*np.nonzero(late)):
        mine = np.packbits(stones[t, b, :, :, 0].reshape(64) > 0.5,
                           bitorder="little")
        theirs = np.packbits(stones[t, b, :, :, 1].reshape(64) > 0.5,
                             bitorder="little")
        mine = int.from_bytes(mine.tobytes(), "little")
        theirs = int.from_bytes(theirs.tobytes(), "little")
        mover = int(np.asarray(traj.to_move)[t, b])
        black, white = (mine, theirs) if mover == env.BLACK \
            else (theirs, mine)
        want = np.sign(solver.solve(black, white, mover).value)
        assert new_v[t, b] == want, (t, b)
        checked += 1
    assert checked == late.sum()
    assert new_v[late].min() >= -1.0 and new_v[late].max() <= 1.0

    # disabled threshold is the identity
    same = selfplay_lib.relabel_exact_values(traj, 0)
    assert same is traj


@pytest.mark.parametrize("mode", [oracle_lib.MODE_CORRECT,
                                  oracle_lib.MODE_COMPAT])
def test_solve_wdl_batch_matches_serial(mode):
    """The native parallel batch solver (lockless shared TT, 4 threads)
    returns the same WDL sign as serial solve_wdl for every position, run
    twice (second run probes a TT warmed by concurrent writers)."""
    positions = []
    for seed in range(40):
        b = random_endgame(6 + seed % 7, mode, 1000 + seed)
        if b.game_over:
            continue
        positions.append((b.black, b.white, b.current_player))
    assert len(positions) >= 25

    solver = endgame.EndgameSolver(compat=(mode == oracle_lib.MODE_COMPAT))
    solver.clear()
    want = [int(np.sign(solver.solve_wdl(bl, wh, mv).value))
            for bl, wh, mv in positions]

    black = np.array([p[0] for p in positions], np.uint64)
    white = np.array([p[1] for p in positions], np.uint64)
    mover = np.array([p[2] for p in positions], np.int32)
    for _ in range(2):
        values, solved, nodes = solver.solve_wdl_batch(
            black, white, mover, num_threads=4)
        assert solved.all() and nodes > 0
        assert np.array_equal(np.sign(values), want)

    # None = unlimited; 0.0 = deadline already passed (the historical
    # relabel_np budget-0 meaning): nothing gets solved
    values, solved, _ = solver.solve_wdl_batch(
        black, white, mover, budget_s=0.0, num_threads=4)
    assert not solved.any()
    # an absurdly tiny positive budget may solve a few; whatever it did
    # solve must still be correct
    values, solved, _ = solver.solve_wdl_batch(
        black, white, mover, budget_s=1e-9, num_threads=4)
    assert np.array_equal(np.sign(values[solved]),
                          np.asarray(want)[solved])


def test_pack_stone_boards_matches_host_packbits():
    """The device-side relabel packer (selfplay.pack_stone_boards) agrees
    bit-for-bit with the host np.packbits convention on random boards, and
    _popcount64_np counts correctly — so the packed relabel fetch sees the
    same positions the old planes fetch did."""
    from alphazero_reversi_tpu import selfplay as selfplay_lib

    rng = np.random.default_rng(11)
    boards = rng.random((5, 7, 8, 8, 3)) < 0.4  # fake planes, ch 0/1 stones
    planes = boards.astype(np.float32)

    mhi, mlo, thi, tlo = (np.asarray(a) for a in
                          selfplay_lib.pack_stone_boards(jnp.asarray(planes)))
    mine = selfplay_lib._combine_u64_np(mhi, mlo)
    theirs = selfplay_lib._combine_u64_np(thi, tlo)

    for t in range(5):
        for b in range(7):
            for arr, ch in ((mine, 0), (theirs, 1)):
                bits = np.packbits(boards[t, b, :, :, ch].reshape(64),
                                   bitorder="little")
                want = int.from_bytes(bits.tobytes(), "little")
                assert int(arr[t, b]) == want, (t, b, ch)
            n = int(mine[t, b] | theirs[t, b])
            assert int(selfplay_lib._popcount64_np(
                np.asarray(mine[t, b] | theirs[t, b]))) \
                == bin(n).count("1")


def test_relabel_np_wrapper_matches_packed_core(net_and_vars):
    """relabel_np (planes input) and relabel_packed_np (device-packed input)
    produce identical values and stats on the same trajectory."""
    from alphazero_reversi_tpu import selfplay as selfplay_lib

    net, variables = net_and_vars
    traj = selfplay_lib.play_games(
        net, variables, jax.random.PRNGKey(9), num_games=3,
        num_simulations=2, c_puct=1.0, dirichlet_alpha=0.3,
        dirichlet_epsilon=0.25, temp_threshold=10, temp_init=1.0,
        temp_final=0.1, max_depth=4, max_moves=60)

    planes = np.asarray(traj.planes)
    to_move = np.asarray(traj.to_move)
    valid = np.asarray(traj.valid)
    value = np.asarray(traj.value)

    v_planes, s_planes = selfplay_lib.relabel_np(
        planes, to_move, valid, value, max_empties=10)

    mhi, mlo, thi, tlo = (np.asarray(a) for a in
                          selfplay_lib.pack_stone_boards(traj.planes))
    v_packed, s_packed = selfplay_lib.relabel_packed_np(
        selfplay_lib._combine_u64_np(mhi, mlo),
        selfplay_lib._combine_u64_np(thi, tlo),
        to_move, valid, value, max_empties=10)

    assert np.array_equal(v_planes, v_packed)
    s_planes.pop("seconds"), s_packed.pop("seconds")
    assert s_planes == s_packed
