#!/usr/bin/env python
"""Cross-framework head-to-head bridge (VERDICT round-1 item 4, option ii).

Plays this framework's agent (Flax net + batched-JAX MCTS, compat rule mode)
directly against the reference's agent (torch ``AlphaZeroNetwork`` +
pointer-tree ``MCTS``, /root/reference/src/mcts/mcts.py:191-719) on
bit-identical boards: our host ``Board(compat=True)`` is move-for-move equal
to the reference ``Board`` (tests/test_env_vs_oracle.py), so one game is
tracked in both representations simultaneously and each agent queries its
own.

Both agents are trained for the same number of iterations at the matched
tiny config (ours: crossplay CLI `--ours-ckpt` from train.py; reference:
refbench/train_reference.py). Random-move anchors calibrate both.

Usage:
  python refbench/crossplay.py --games 20 --sims 100 \
      --ref-model refbench/workdir_train/checkpoints/best_model.pth \
      --ours-ckpt refbench/workdir_repo_train/checkpoints

Outputs refbench/crossplay_results.json with W/D/L per pairing and the
head-to-head ELO difference 400*log10(s/(1-s)).
"""
import argparse
import json
import math
import os
import random
import sys
import time

sys.path.insert(0, "/root/repo")

# honor a CPU-platform request BEFORE any backend touch: env vars alone are
# unreliable in this image (sitecustomize imports jax at interpreter
# startup — see tests/conftest.py), so go through jax.config
if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference"


# --------------------------------------------------------------- our agent
class OursAgent:
    name = "ours"

    def __init__(self, ckpt_dir, sims, temperature):
        import jax
        from alphazero_reversi_tpu import checkpoint as ckpt_lib
        from alphazero_reversi_tpu.config import MCTSConfig, ModelConfig
        from alphazero_reversi_tpu.mcts import search as search_lib
        from alphazero_reversi_tpu.models import resnet

        self.jax = jax
        net = resnet.build_network(ModelConfig())
        variables = resnet.init_variables(net, jax.random.PRNGKey(0))
        if ckpt_dir:
            restored = ckpt_lib.restore_best(ckpt_dir, variables)
            if restored is None:
                raise FileNotFoundError(f"no best model under {ckpt_dir}")
            variables = restored
        from alphazero_reversi_tpu.mcts.transposition import \
            TranspositionTable

        self.mcts = search_lib.MCTS(
            net, variables,
            MCTSConfig(num_simulations=sims, c_puct=1.0),
            compat=True,
            # noise-free match play repeats openings across games: cache
            # them (symmetry-canonical keys), skipping whole searches
            transposition_table=TranspositionTable())
        self.temperature = temperature
        self.key = jax.random.PRNGKey(0)

    def reseed(self, seed):
        self.key = self.jax.random.PRNGKey(seed)

    def select_move(self, our_board, ref_game):
        jax = self.jax
        state = jax.tree_util.tree_map(lambda x: x[None], our_board._state)
        self.key, k1 = jax.random.split(self.key)
        probs, _ = self.mcts.get_action_probs(
            state, k1, temperature=self.temperature, add_noise=False)
        p = np.asarray(probs[0])
        action = int(np.random.choice(len(p), p=p / p.sum()))
        return (-1, -1) if action == 64 else divmod(action, 8)


# --------------------------------------------------------- reference agent
class RefAgent:
    name = "reference"

    def __init__(self, model_path, sims, temperature):
        import torch
        torch.set_num_threads(1)
        sys.path.insert(0, REF)
        sys.path.insert(0, os.path.join(REF, "src"))
        from src.mcts.mcts import MCTS as RefMCTS
        from src.model.network import AlphaZeroNetwork

        model = AlphaZeroNetwork(board_size=8, num_res_blocks=5,
                                 num_filters=128)
        if model_path:
            state = torch.load(model_path, map_location="cpu")
            # the reference auto-JITs on eval() and may save the scripted
            # module's state dict; strip the prefix exactly as its own
            # loaders do (/root/reference/src/mcts/mcts.py:458-482)
            state = {(k[len("_script_module."):]
                      if k.startswith("_script_module.") else k): v
                     for k, v in state.items()}
            model.load_state_dict(state)
        model.eval()
        self._mcts_cls = RefMCTS
        self.model = model
        self.sims = sims
        self.temperature = temperature

    def reseed(self, seed):
        np.random.seed(seed)

    def select_move(self, our_board, ref_game):
        # fresh tree per move == update_with_move semantics (mcts.py:696-719
        # discards the subtree in practice; SURVEY.md appendix)
        mcts = self._mcts_cls(self.model, c_puct=1.0,
                              num_simulations=self.sims, batch_size=64)
        best, _ = mcts.get_action_probs(ref_game, self.temperature)
        return best


class RandomAgent:
    name = "random"

    def __init__(self):
        self.rng = random.Random(0)

    def reseed(self, seed):
        self.rng = random.Random(seed)

    def select_move(self, our_board, ref_game):
        moves = our_board.get_valid_moves()
        return self.rng.choice(moves) if moves else (-1, -1)


# ------------------------------------------------------------- match logic
def play_game(black, white, seed):
    """One game; returns winner agent name or 'draw'. Boards tracked in both
    frameworks; divergence is a hard error (the bit-exactness claim)."""
    from alphazero_reversi_tpu.env.game import Board

    sys.path.insert(0, REF)
    from src.game.game import ReversiGame

    ours = Board(compat=True)
    ref = ReversiGame()
    black.reseed(seed)
    white.reseed(seed + 1)
    np.random.seed(seed)

    plies = 0
    while not ours.game_over and plies < 130:
        agent = black if ours.current_player == 1 else white
        move = agent.select_move(ours, ref)
        ok_ours = ours.make_move(*move)
        ok_ref = ref.make_move(*move)
        assert ok_ours and ok_ref, (
            f"move {move} rejected (ours={ok_ours} ref={ok_ref}) ply {plies}")
        assert ours.black == ref.board.black and ours.white == ref.board.white, \
            f"boards diverged at ply {plies}"
        plies += 1

    assert ref.is_game_over()
    w = ours.winner or 0
    assert (ref.get_winner() or 0) == w, "winners disagree"
    if w == 0:
        return "draw"
    return black.name if w == 1 else white.name


def run_match(a, b, games, seed0):
    """Alternating colors; returns record dict from a's perspective."""
    rec = {"w": 0, "d": 0, "l": 0}
    t0 = time.time()
    for g in range(games):
        blk, wht = (a, b) if g % 2 == 0 else (b, a)
        res = play_game(blk, wht, seed0 + 17 * g)
        if res == "draw":
            rec["d"] += 1
        elif res == a.name:
            rec["w"] += 1
        else:
            rec["l"] += 1
        print(f"  game {g + 1}/{games}: {res}  "
              f"({rec['w']}W/{rec['d']}D/{rec['l']}L, "
              f"{time.time() - t0:.0f}s)", flush=True)
    n = games
    score = (rec["w"] + 0.5 * rec["d"]) / n
    s = min(max(score, 1.0 / (4 * n)), 1 - 1.0 / (4 * n))  # avoid +/-inf
    rec["score"] = round(score, 3)
    rec["elo_diff"] = round(400 * math.log10(s / (1 - s)), 1)
    rec["seconds"] = round(time.time() - t0, 1)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", type=int, default=20)
    ap.add_argument("--sims", type=int, default=100)
    ap.add_argument("--temperature", type=float, default=0.1)
    ap.add_argument("--ref-model", default=os.path.join(
        HERE, "workdir_train/checkpoints/best_model.pth"))
    ap.add_argument("--ours-ckpt", default=os.path.join(
        HERE, "workdir_repo_train/checkpoints"))
    ap.add_argument("--anchor-games", type=int, default=10,
                    help="games per agent vs the random anchor")
    ap.add_argument("--out", default=os.path.join(HERE,
                                                  "crossplay_results.json"))
    args = ap.parse_args()

    print("loading agents...", flush=True)
    ours = OursAgent(args.ours_ckpt, args.sims, args.temperature)
    ref = RefAgent(args.ref_model, args.sims, args.temperature)
    rnd = RandomAgent()

    results = {"protocol": {
        "games": args.games, "sims": args.sims,
        "temperature": args.temperature, "ref_model": args.ref_model,
        "ours_ckpt": args.ours_ckpt,
        "rules": "compat (reference-exact), colors alternated, "
                 "elo_diff = 400*log10(s/(1-s)) from the first agent's "
                 "perspective"}}

    print(f"=== ours vs reference ({args.games} games) ===", flush=True)
    results["ours_vs_reference"] = run_match(ours, ref, args.games, 1000)
    if args.anchor_games:
        print("=== ours vs random ===", flush=True)
        results["ours_vs_random"] = run_match(ours, rnd, args.anchor_games,
                                              2000)
        print("=== reference vs random ===", flush=True)
        results["reference_vs_random"] = run_match(ref, rnd,
                                                   args.anchor_games, 3000)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
