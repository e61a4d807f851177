"""Command-line interface.

Mirrors the reference's CLI surface (/root/reference/train.py:44-92 —
``create-config`` / ``train`` / ``continue``; /root/reference/run.py and
run_pipeline.py — timestamped run dirs with rewritten output paths;
/root/reference/run_tournament.py:34-163 — checkpoint discovery + round-robin
vs a random baseline with persistent ELO). Thin argparse over the package:
all the real work lives in ``pipeline`` / ``arena`` / ``checkpoint``.

The reference's ``train.py continue`` NameErrors on an unimported ``torch``
(train.py:75, SURVEY.md appendix); here ``continue`` is just ``train
--resume``.
"""
from __future__ import annotations

import argparse
import datetime
import glob
import os
import sys
from typing import List, Optional

import jax

from . import checkpoint as ckpt_lib
from .arena import Arena
from .config import Config, get_default_config
from .models import resnet
from .pipeline import AlphaZeroPipeline


def _load_config(path: Optional[str]) -> Config:
    return Config.load(path) if path else get_default_config()


def _make_run_dirs(config: Config, output_dir: str) -> str:
    """Timestamped run dir with all output paths rewritten into it
    (run.py:17-36 analog)."""
    ts = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    run_dir = os.path.join(output_dir, f"run_{ts}")
    os.makedirs(run_dir, exist_ok=True)
    config.training.checkpoint_dir = os.path.join(run_dir, "checkpoints")
    config.logging.log_dir = os.path.join(run_dir, "logs")
    config.self_play.save_dir = os.path.join(run_dir, "self_play_data")
    config.tournament.output_dir = os.path.join(run_dir,
                                                "tournament_results")
    config.save(os.path.join(run_dir, "config.json"))
    return run_dir


def cmd_create_config(args) -> int:
    """Scaffold a default config file (train.py:11-42)."""
    config = get_default_config()
    config.save(args.output)
    print(f"wrote default config to {args.output}")
    return 0


def cmd_train(args) -> int:
    # multi-host process-group init (no-op unless a coordinator is given);
    # must run before any backend touch so jax.devices() spans all hosts
    from .parallel import mesh as mesh_lib
    mesh_lib.initialize_distributed(
        coordinator_address=getattr(args, "coordinator", None),
        num_processes=getattr(args, "num_processes", None),
        process_id=getattr(args, "process_id", None))
    config = _load_config(args.config)
    if args.iterations is not None:
        config.training.num_epochs = args.iterations
    if args.run_dir:
        _make_run_dirs(config, args.run_dir)
    # default run name derives from config.project_name + timestamp, the
    # reference's Logger run naming (/root/reference/src/logger.py:28); an
    # explicit --run-name wins
    run_name = args.run_name or (
        f"{config.project_name}_"
        f"{datetime.datetime.now().strftime('%Y%m%d_%H%M%S')}")
    pipe = AlphaZeroPipeline(config, run_name=run_name)
    if args.resume:
        pipe.load_checkpoint(args.checkpoint)
    pipe.train()
    return 0


def cmd_tournament(args) -> int:
    """Round-robin over discovered checkpoints + random baseline
    (run_tournament.py:34-163)."""
    from .parallel import mesh as mesh_lib

    config = _load_config(args.config)
    net = resnet.build_network(config.model)
    template = resnet.init_variables(net, jax.random.PRNGKey(0))
    from .learner import TrainState, variables_of
    from .pipeline import make_checkpoint_template
    full_template = make_checkpoint_template(config)

    # multi-device hosts shard each match's game batch over the config
    # mesh (arena.play_pair mesh); a 1-device mesh collapses to unsharded
    ar = Arena(net, config.tournament, compat=config.env_compat,
               mesh=mesh_lib.make_mesh(config.mesh))
    found: List[str] = []
    for pattern in ("it_*", "best_model"):
        found.extend(sorted(glob.glob(os.path.join(args.model_dir,
                                                   pattern))))
    for path in found:
        name = os.path.basename(path)
        try:
            if name == "best_model":
                variables = ckpt_lib.restore_best(args.model_dir, template)
            else:
                tree = ckpt_lib.restore_checkpoint(path, full_template)
                state = tree["state"]
                if not isinstance(state, TrainState):
                    state = TrainState(*state)
                variables = variables_of(state)
        except Exception as e:  # skip incompatible checkpoints, like :103-106
            print(f"skipping {name}: {e}", file=sys.stderr)
            continue
        ar.add_player(name, variables)
    ar.add_player("random", None)

    elo_path = os.path.join(config.tournament.output_dir,
                            config.tournament.elo_file)
    # persistent ratings across runs (run_tournament.py:73-79)
    if os.path.exists(elo_path):
        from .elo import ELORatingSystem
        ar.elo = ELORatingSystem.load_ratings(elo_path)
        for p in ar.players:
            ar.elo.add_player(p.name)

    board = ar.run_tournament(jax.random.PRNGKey(config.seed),
                              rounds=args.rounds)
    for i, p in enumerate(board):
        print(f"{i + 1:2d}. {p['player_id']:<30s} "
              f"{p['rating']:7.1f}  ({p['games_played']} games)")
    ar.save_results(elo_path)
    print(f"ratings saved to {elo_path}")
    return 0


def _parse_move_token(token: str):
    """Parse one ``analyze`` move token — ``pass``, algebraic (``d3``), or
    ``row,col`` — into a validated (row, col) pair. Raises ValueError with a
    human-readable reason on anything malformed or out of range (an
    unvalidated ``i1`` would otherwise silently wrap to a different
    square)."""
    t = token.strip().lower()
    if t == "pass":
        return -1, -1
    if "," in t:
        parts = t.split(",")
        if len(parts) != 2 or not all(p.strip().isdigit() for p in parts):
            raise ValueError("expected ROW,COL with integers 0-7")
        r, c = (int(p) for p in parts)
    else:
        if (len(t) < 2 or not ("a" <= t[0] <= "h")
                or not t[1:].isdigit()):
            raise ValueError(
                "expected algebraic a1-h8, ROW,COL, or 'pass'")
        c, r = ord(t[0]) - ord("a"), int(t[1:]) - 1
    if not (0 <= r < 8 and 0 <= c < 8):
        raise ValueError(f"square ({r},{c}) is off the 8x8 board")
    return r, c


def _action_name(action: int) -> str:
    """65-way action index -> display name ('pass' or algebraic a1-h8)."""
    if action == 64:
        return "pass"
    return f"{chr(ord('a') + action % 8)}{action // 8 + 1}"


def _net_from_args(config, checkpoint_dir):
    """Build the configured net; load 'best' weights from checkpoint_dir if
    given. Returns (net, variables) — variables None when the requested
    checkpoint is missing."""
    net = resnet.build_network(config.model)
    template = resnet.init_variables(net, jax.random.PRNGKey(0))
    if checkpoint_dir:
        return net, ckpt_lib.restore_best(checkpoint_dir, template)
    return net, template


def cmd_analyze(args) -> int:
    """Position analysis: play the given moves from the initial board, run a
    full noise-free search, print the top moves with visit counts and the
    root value. (No reference analog — its MCTS had no inspection surface;
    this exposes ours through the OO game API.)"""
    import numpy as np

    from .config import MCTSConfig
    from .env.game import Board
    from .mcts import search as search_lib

    config = _load_config(args.config)
    net, variables = _net_from_args(config, args.checkpoint_dir)
    if variables is None:
        print(f"no best checkpoint under {args.checkpoint_dir}",
              file=sys.stderr)
        return 1

    board = Board(compat=config.env_compat)
    for token in args.moves:
        try:
            r, c = _parse_move_token(token)
        except ValueError as e:
            print(f"bad move {token!r}: {e}", file=sys.stderr)
            return 1
        if not board.make_move(r, c):
            print(f"illegal move {token!r} at this position",
                  file=sys.stderr)
            return 1
    print(board)

    sims = args.sims or config.mcts.num_simulations
    leaf_batch = max(1, config.mcts.batch_size)
    if sims % leaf_batch:
        rounded = -(-sims // leaf_batch) * leaf_batch
        print(f"note: rounding --sims {sims} up to {rounded} "
              f"(a multiple of mcts.batch_size={leaf_batch})",
              file=sys.stderr)
        sims = rounded
    solve_empties = (args.solve if args.solve is not None
                     else config.mcts.exact_endgame_empties)
    mcts = search_lib.MCTS(
        net, variables,
        MCTSConfig(num_simulations=sims, c_puct=config.mcts.c_puct,
                   max_depth=config.mcts.max_depth,
                   batch_size=config.mcts.batch_size,
                   algorithm=config.mcts.algorithm,
                   max_considered_actions=config.mcts.max_considered_actions,
                   c_visit=config.mcts.c_visit,
                   c_scale=config.mcts.c_scale,
                   exact_endgame_empties=solve_empties),
        compat=config.env_compat)
    state = jax.tree_util.tree_map(lambda x: x[None], board._state)
    _, result = mcts.get_action_probs(state, jax.random.PRNGKey(config.seed),
                                      temperature=1.0, add_noise=False)
    mover = "black" if board.current_player == 1 else "white"
    if isinstance(result, search_lib.ExactResult):
        name = _action_name(int(result.chosen_action[0]))
        print(f"\nexact endgame solve ({mover} to move): "
              f"{result.disc_diff:+d} discs under optimal play   "
              f"[{result.nodes} solver nodes]")
        print(f"  optimal move: {name}")
        return 0
    vc = np.asarray(result.visit_counts[0])
    value = float(np.asarray(result.root_value[0]))
    print(f"\nroot value ({mover} to move): {value:+.3f}   "
          f"[{sims} simulations]")
    order = np.argsort(vc)[::-1]
    shown = 0
    for a in order:
        if vc[a] == 0 or shown >= args.top:
            break
        name = _action_name(a)
        print(f"  {name:>5s}  visits {int(vc[a]):5d}  "
              f"({vc[a] / max(vc.sum(), 1):5.1%})")
        shown += 1
    return 0


def cmd_play(args) -> int:
    """Interactive terminal match against the agent (no reference analog —
    the reference ships no human-play surface). The human enters moves as
    algebraic (d3), ROW,COL, or 'pass'; 'q' quits. The agent searches
    noise-free at --sims and plays exact endgames when --solve /
    mcts.exact_endgame_empties is set."""
    import numpy as np

    from .config import MCTSConfig
    from .env.game import Board
    from .mcts import search as search_lib
    from .mcts.transposition import TranspositionTable

    config = _load_config(args.config)
    net, variables = _net_from_args(config, args.checkpoint_dir)
    if variables is None:
        print(f"no best checkpoint under {args.checkpoint_dir}",
              file=sys.stderr)
        return 1

    human = 1 if args.color == "black" else 2
    sims = args.sims or config.mcts.num_simulations
    solve_empties = (args.solve if args.solve is not None
                     else config.mcts.exact_endgame_empties)
    mcts = search_lib.MCTS(
        net, variables,
        MCTSConfig(num_simulations=sims, c_puct=config.mcts.c_puct,
                   max_depth=config.mcts.max_depth,
                   batch_size=config.mcts.batch_size,
                   algorithm=config.mcts.algorithm,
                   max_considered_actions=config.mcts.max_considered_actions,
                   c_visit=config.mcts.c_visit,
                   c_scale=config.mcts.c_scale,
                   exact_endgame_empties=solve_empties),
        compat=config.env_compat,
        # repeated positions (transpositions, takeback-free rematches) hit
        # the cache instead of re-searching
        transposition_table=TranspositionTable())

    board = Board(compat=config.env_compat)
    key = jax.random.PRNGKey(config.seed)
    print(f"you play {'black (X)' if human == 1 else 'white (O)'} — "
          f"agent at {sims} simulations"
          + (f", exact endgames at <={solve_empties} empties"
             if solve_empties else ""))
    print("moves: algebraic (d3), ROW,COL, 'pass'; 'q' to quit")
    while not board.game_over:
        print()
        print(board)
        if board.current_player == human:
            legal = board.get_valid_moves()
            if not legal:
                print("no legal moves — you must pass")
            try:
                token = input("your move> ").strip()
            except EOFError:
                token = "q"
            if token.lower() in ("q", "quit", "resign", "exit"):
                print("game aborted")
                return 0
            try:
                r, c = _parse_move_token(token)
            except ValueError as e:
                print(f"bad move {token!r}: {e}")
                continue
            if not board.make_move(r, c):
                names = ", ".join(_action_name(rr * 8 + cc)
                                  for rr, cc in legal) or "pass"
                print(f"illegal move {token!r} here (legal: {names})")
                continue
        else:
            state = jax.tree_util.tree_map(lambda x: x[None], board._state)
            key, k1 = jax.random.split(key)
            probs, result = mcts.get_action_probs(
                state, k1, temperature=0.0, add_noise=False)
            action = int(np.asarray(probs[0]).argmax())
            exact = isinstance(result, search_lib.ExactResult)
            print(f"agent plays {_action_name(action)}"
                  + (f" (exact: {result.disc_diff:+d} discs optimal)"
                     if exact else ""))
            ok = board.make_move(*((-1, -1) if action == 64
                                   else divmod(action, 8)))
            assert ok, "agent produced an illegal move"

    print()
    print(board)
    nb, nw = board.get_score()
    w = board.winner or 0
    outcome = ("draw" if w == 0
               else "you win!" if w == human else "agent wins")
    print(f"game over: X {nb} - O {nw} — {outcome}")
    return 0


def cmd_import_checkpoint(args) -> int:
    """Migrate a reference torch ``.pth`` into our checkpoint store
    (interop.import_to_orbax): reference users carry trained models across."""
    from . import interop

    cfg = interop.import_to_orbax(args.pth, args.checkpoint_dir)
    print(f"imported {args.pth} -> {args.checkpoint_dir} "
          f"(best): {cfg.num_res_blocks}x{cfg.num_filters} net, "
          f"board {cfg.board_size}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="alphazero-reversi-tpu",
        description="TPU-native AlphaZero Reversi framework")
    p.add_argument(
        "--platform", default=None, metavar="NAME",
        help="force the JAX platform (e.g. 'cpu') before any backend "
             "touch. More robust than JAX_PLATFORMS on hosts whose "
             "site setup pre-registers an accelerator plugin; use it to "
             "run the CLI on CPU-only machines or when the accelerator "
             "is unavailable")
    sub = p.add_subparsers(dest="command", required=True)

    c = sub.add_parser("create-config", help="write a default config file")
    c.add_argument("--output", "-o", default="config.json")
    c.set_defaults(fn=cmd_create_config)

    t = sub.add_parser("train", help="run the training pipeline")
    t.add_argument("--config", "-c", default=None)
    t.add_argument("--iterations", type=int, default=None,
                   help="override training.num_epochs")
    t.add_argument("--run-dir", default=None,
                   help="create a timestamped run dir here (run.py analog)")
    t.add_argument("--run-name", default=None, help="run name for logs (default: <project_name>_<timestamp>, the reference Logger naming)")
    t.add_argument("--resume", action="store_true")
    t.add_argument("--checkpoint", default=None,
                   help="explicit checkpoint path for --resume")
    t.add_argument("--coordinator", default=None,
                   help="multi-host coordinator address "
                        "(jax.distributed.initialize)")
    t.add_argument("--num-processes", type=int, default=None)
    t.add_argument("--process-id", type=int, default=None)
    t.set_defaults(fn=cmd_train)

    # `continue` == `train --resume` (train.py:70-92, minus its NameError)
    k = sub.add_parser("continue", help="resume training from the latest "
                                        "checkpoint")
    k.add_argument("--config", "-c", default=None)
    k.add_argument("--iterations", type=int, default=None)
    k.add_argument("--run-dir", default=None)
    k.add_argument("--run-name", default=None, help="run name for logs (default: <project_name>_<timestamp>, the reference Logger naming)")
    k.add_argument("--checkpoint", default=None)
    k.set_defaults(fn=cmd_train, resume=True)

    m = sub.add_parser("tournament", help="round-robin ELO tournament over "
                                          "checkpoints")
    m.add_argument("--config", "-c", default=None)
    m.add_argument("--model-dir", required=True)
    m.add_argument("--rounds", type=int, default=None)
    m.set_defaults(fn=cmd_tournament)

    a = sub.add_parser("analyze",
                       help="search a position and print the top moves")
    a.add_argument("moves", nargs="*",
                   help="moves from the initial position (algebraic like "
                        "'d3', 'r,c' pairs, or 'pass')")
    a.add_argument("--config", "-c", default=None)
    a.add_argument("--checkpoint-dir", "-d", default=None,
                   help="load the 'best' model from here (default: "
                        "untrained net)")
    a.add_argument("--sims", type=int, default=None)
    a.add_argument("--top", type=int, default=8)
    a.add_argument(
        "--solve", type=int, default=None, metavar="EMPTIES",
        help="solve the position exactly (native alpha-beta, "
             "env/endgame.py) when it has at most EMPTIES empty squares, "
             "overriding mcts.exact_endgame_empties. ~20 empties is "
             "seconds on one core; beyond that grows fast")
    a.set_defaults(fn=cmd_analyze)

    g = sub.add_parser("play",
                       help="play against the agent in the terminal")
    g.add_argument("--config", "-c", default=None)
    g.add_argument("--checkpoint-dir", "-d", default=None,
                   help="load the 'best' model from here (default: "
                        "untrained net)")
    g.add_argument("--color", choices=["black", "white"], default="black",
                   help="your color (black moves first)")
    g.add_argument("--sims", type=int, default=None)
    g.add_argument(
        "--solve", type=int, default=None, metavar="EMPTIES",
        help="agent plays exact endgames at <= EMPTIES empty squares "
             "(overrides mcts.exact_endgame_empties)")
    g.set_defaults(fn=cmd_play)

    i = sub.add_parser(
        "import-checkpoint",
        help="migrate a reference PyTorch .pth into an Orbax 'best' "
             "checkpoint this framework's train/tournament commands load")
    i.add_argument("pth", help="reference .pth (raw state_dict or "
                               "{'model_state_dict': ...} wrapper)")
    i.add_argument("--checkpoint-dir", "-d", required=True)
    i.set_defaults(fn=cmd_import_checkpoint)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    if args.platform:
        # must land before the first backend touch — every command defers
        # device work until after this point
        jax.config.update("jax_platforms", args.platform)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
