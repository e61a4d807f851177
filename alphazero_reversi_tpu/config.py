"""Configuration system: nested dataclasses with JSON round-trip.

Mirrors the reference's config surface (/root/reference/src/config.py) —
same sections, same field names where the concept carries over — with
TPU-native additions (mesh/sharding, dtypes, batched env sizes) and with the
fields the reference declared but never implemented (Dirichlet noise,
temperature scheduling, head sizes, dropout — SURVEY.md §2.4) actually wired
up in this framework.
"""
from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field
from typing import Any, Dict, List, Optional


@dataclass
class ModelConfig:
    """Network architecture (reference: src/config.py:10-18).

    Unlike the reference network (src/model/network.py:56-62), which
    hard-codes a 256-unit value head and ignores ``dropout``,
    ``value_head_hidden_size`` and ``dropout`` are honored here. Defaults
    match the reference's *actual behavior* (256 hidden units, no dropout).
    """

    board_size: int = 8
    num_res_blocks: int = 5
    num_filters: int = 128
    value_head_hidden_size: int = 256
    policy_head_channels: int = 2
    value_head_channels: int = 1
    dropout: float = 0.0
    compute_dtype: str = "bfloat16"  # MXU-native; params stay float32
    # False = BN-free variant (conv biases instead of BatchNorm): no batch
    # statistics, so DP training is bit-equivalent to single-device
    # large-batch SGD (models/resnet.py) — used by the dryrun's exact
    # DP-vs-single cross-check and appropriate when per-shard batches are
    # too small for stable BN statistics. True matches the reference net.
    use_batch_norm: bool = True


@dataclass
class MCTSConfig:
    """Search parameters (reference: src/config.py:20-29).

    ``dirichlet_alpha``/``dirichlet_epsilon`` are applied at the root
    (the reference only declared them — SURVEY.md §2.4).

    The reference's ``mcts.temperature`` / ``mcts.temperature_threshold``
    duplicated the self-play schedule fields and were never consumed
    (src/config.py:27-28); here the schedule lives solely in
    ``SelfPlayConfig`` (``temp_init``/``temp_final``/``temp_threshold``) and
    ``Config.from_dict`` migrates the reference spellings into it, so
    reference JSONs keep their meaning instead of being silently dropped.
    """

    num_simulations: int = 500
    c_puct: float = 1.0
    dirichlet_alpha: float = 0.03
    dirichlet_epsilon: float = 0.25
    # search algorithm: "puct" (classic AlphaZero, the reference's) or
    # "gumbel" (sequential halving with Gumbel, Danihelka et al. 2022 —
    # mcts/gumbel.py), which keeps the policy-improvement property at very
    # small simulation budgets (16-32). Gumbel ignores c_puct and the
    # Dirichlet fields (exploration comes from the Gumbel draw) and uses the
    # three fields below instead.
    algorithm: str = "puct"
    max_considered_actions: int = 16  # gumbel: root candidates (top-m)
    c_visit: float = 50.0  # gumbel: sigma(q) visit offset
    c_scale: float = 0.1  # gumbel: sigma(q) scale
    # static descent-depth bound: select/backup unroll this many levels per
    # simulation (deeper simulations are evaluated at the node reached,
    # mctx-style). PUCT trees at <=1000 sims rarely exceed ~15 levels.
    max_depth: int = 24
    # leaves selected/evaluated/expanded per simulation round, diversified
    # by in-round virtual loss (the reference's batch_size collected leaves
    # within ONE game, src/mcts/mcts.py:348-392; here each of the B games
    # contributes `batch_size` leaves per round, amortizing per-round tree
    # costs). 1 = classic one-leaf-per-round search.
    batch_size: int = 1
    # staged tree-capacity growth: run early simulations in a smaller tree
    # and zero-pad between stages. Bit-identical results at any value
    # (tested); cuts the per-round full-pass costs that scale with tree
    # bytes. 1 disables.
    num_stages: int = 6
    # exact endgame solving on the HOST play path (mcts.search.MCTS /
    # analyze CLI): when the position has <= this many empty squares, play
    # the native alpha-beta solver's optimal move instead of searching
    # (env/endgame.py — an extension beyond the reference, which plays
    # endgames from search statistics alone). 0 disables. Does not affect
    # jitted/batched device search (self-play, arena).
    exact_endgame_empties: int = 0
    # tree reuse across consecutive moves of a game (the working version of
    # the reference's intended-but-broken ``update_with_move``,
    # src/mcts/mcts.py:696-719). "root": carry the played child's edge
    # statistics (visits + value sums, 1 level) into the next search's root
    # — warm Q estimates inform selection from round 0 while the visit
    # budget/policy targets stay fresh (mcts.tree.root_child_warm_stats).
    # Applied on the self-play path (selfplay.play_games); "off" disables
    # (bit-identical to the historical program).
    tree_reuse: str = "off"
    # weight multiplier on the carried warm stats (tree.discount_warm:
    # visits scale and round to integers, per-edge Q preserved). 1.0 =
    # full weight — correct for Gumbel, whose halving schedule allocates
    # on fresh counts (+155 ELO at the flagship Gumbel-32 cell,
    # refbench/reuse_strength.json). PUCT conflates evidence with
    # allocation: undiscounted warm counts suppress exploration of warm
    # edges and give stale Q ~warm-visits of inertia (measured -59 ELO at
    # PUCT-100); use a small discount (~0.25) there.
    tree_reuse_discount: float = 1.0


@dataclass
class SelfPlayConfig:
    """Self-play data generation (reference: src/config.py:31-42).

    ``num_parallel_games`` is the on-device env batch width (the reference
    accepted it but looped sequentially — SURVEY.md §2.3); temperature
    scheduling (``temp_threshold``/``temp_init``/``temp_final``) is applied
    per move as PLAN.md intended.

    ``num_games`` is the per-iteration game target (reference semantics,
    src/config.py:33): each iteration plays
    ``ceil(num_games / num_parallel_games)`` jitted batches of
    ``num_parallel_games`` lockstep games — i.e. the target is rounded UP
    to whole device batches.
    """

    num_games: int = 30
    num_parallel_games: int = 64
    save_dir: str = "self_play_data"
    save_every: int = 10
    max_moves: int = 60  # 8x8 Reversi: exactly one placement per ply
    temp_threshold: int = 15
    temp_init: float = 1.0
    temp_final: float = 0.1
    # exact value targets for late positions (beyond-reference extension):
    # after each self-play batch, positions with <= this many empty squares
    # get their value target replaced by the native endgame solver's
    # game-theoretic outcome under optimal play (sign, mover perspective,
    # env/endgame.py) instead of the noisy realized outcome — the realized
    # result of a misplayed endgame teaches the value head the wrong label.
    # Host-side post-processing (~ms/position at <=12 empties). 0 disables.
    exact_value_empties: int = 0
    # wall-clock budget (seconds) for that relabeling pass, per self-play
    # batch: candidates are solved empties-ascending (cheapest, most
    # label-valuable first) and solving stops at the budget — deeper
    # positions keep their realized-outcome label (selfplay.
    # relabel_exact_values_with_stats; cost is logged per batch as
    # selfplay/relabel_*). <= 0 means unbounded.
    exact_value_budget_s: float = 30.0


@dataclass
class TrainingConfig:
    """Learner parameters (reference: src/config.py:44-60)."""

    batch_size: int = 64
    num_epochs: int = 10  # outer self-play+train iterations (reference naming)
    learning_rate: float = 0.001
    weight_decay: float = 1e-4
    lr_milestones: List[int] = field(default_factory=list)
    lr_gamma: float = 0.1
    checkpoint_dir: str = "checkpoints"
    save_interval: int = 1
    gradient_clip: float = 1.0
    policy_loss_weight: float = 1.0
    value_loss_weight: float = 1.0
    # "soft" = cross-entropy against the full MCTS visit distribution (the
    # reference's orphaned trainer, src/training/trainer.py:163); "argmax"
    # replicates the live pipeline's CE-on-argmax (src/trainer/pipeline.py:308).
    policy_loss: str = "soft"
    replay_capacity: int = 200_000  # device-resident replay buffer positions
    train_on_latest_only: bool = False  # True = reference behavior (no replay)
    # Shard the replay buffer over the mesh's data axis instead of
    # replicating it (parallel.replay_sharded): each shard ring-inserts its
    # OWN games' positions (zero-communication insert — the replicated
    # design all-gathers the trajectory every iteration at pod scale) and
    # holds 1/d of the buffer's HBM; the scanned DP SGD samples each
    # shard's block from its local pool. Checkpoints store the canonical
    # scalar-cursor layout, so they restore across topologies and modes.
    # capacity rounds UP to a multiple of the data axis. No effect on
    # single-device meshes. Off by default (the replicated buffer remains
    # bit-exactly reference-matched for sampling).
    shard_replay_buffer: bool = False
    # SGD steps fused into ONE compiled dispatch (learner.train_steps): the
    # scan samples each batch from the device-resident replay buffer inside
    # the program, so K steps pay one host round-trip instead of K. >1
    # amortizes per-dispatch latency (the dominant flagship iteration cost
    # through the TPU relay, PERF.md); 1 = one dispatch per step. The
    # per-iteration step budget rounds UP to whole chunks. Works on both the
    # single-device learner (learner.train_steps) and multi-device meshes
    # (parallel.dp.make_dp_train_steps: a shard_map'd scan with pmean'd
    # grads/BN stats, sampling-equivalent to the per-step DP path).
    steps_per_dispatch: int = 1
    # Random dihedral-8 augmentation of sampled positions (symmetry.py, the
    # living replacement for the reference's dead symmetry-hash machinery,
    # mcts.py:369-383). Off by default: compat-mode rules are not
    # D4-equivariant and the default pipeline stays reference-matched.
    augment_symmetries: bool = False
    # Overlap checkpoint disk writes with the next iteration (orbax async
    # save: arrays are copied out of their buffers before save() returns,
    # so subsequent donated train steps cannot corrupt the write; the next
    # save — or train-loop exit — waits for the previous one). Works on
    # multi-process pipelines too (r4): the primary alone schedules the
    # write from already-host-fetched state, and restores are protected by
    # wait-for-saves + a barrier in load_checkpoint rather than by making
    # every save synchronous.
    async_checkpointing: bool = True
    # Checkpoint the replay buffer every K-th save only; in-between saves
    # reuse the most recent host snapshot of it. The buffer dominates the
    # checkpoint's device->host fetch (~92 of ~95 MB at the flagship 200k
    # capacity — PERF.md r3 "checkpoint critical path"), so K>1 removes most
    # of the per-save fetch cost at the price of a documented staleness: a
    # resume from an in-between checkpoint gets params/optimizer at
    # iteration N with replay contents from the last due save (< K SAVES
    # older, i.e. < K * save_interval iterations; it refills within an
    # iteration or two of resuming).
    # Interrupt saves always refresh. 1 = every save carries the live
    # buffer (exact resume, the default). Works on single-controller AND
    # multi-process pipelines (every process evolves the same due-ness, so
    # the skip cannot diverge across hosts).
    replay_checkpoint_interval: int = 1
    # Run the checkpoint's device->host fetch burst on a background thread
    # too (requires async_checkpointing): save_checkpoint captures device
    # references (jax arrays are immutable and the pipeline only REBINDS
    # state/buffer between iterations) and returns immediately; the worker
    # fetches + schedules the orbax write while the next iteration's
    # self-play runs. The pipeline joins the worker before anything that
    # DONATES the referenced buffers (_train_epoch's scanned SGD) and
    # before the next save/restore/exit, so the snapshot is consistent by
    # construction. Multi-process runs use it too: the primary's worker
    # fetches via COLLECTIVE-FREE local-shard reads (every checkpoint leaf
    # is replicated; multihost.fetch_replicated_local) so it cannot
    # interleave with main-thread collectives, non-primaries schedule
    # nothing, and the finalized-before-read guarantee lives at restore
    # time (load_checkpoint waits + broadcasts) instead of a post-save
    # barrier. Falls back to the synchronous path if any leaf is not
    # replicated (metadata check, identical across processes). Hides the
    # ~2.6-3.5 s flagship state fetch (PERF.md r4).
    background_checkpoint_fetch: bool = False
    # Relay-hang watchdog (hostfetch.py): abort any critical device->host
    # fetch (checkpoint state, replay snapshot, relabel/trajectory fetches)
    # that exceeds this many wall-clock seconds with a clean
    # FetchTimeoutError instead of hanging forever — one indefinite
    # device_get hang was observed in production at flagship iteration 300
    # (PERF.md r3). 0 disables (the default; flagship configs set ~120 s,
    # comfortably above the measured ~3 s flagship checkpoint fetch).
    fetch_timeout_s: float = 0.0


@dataclass
class TournamentConfig:
    """Arena/ELO evaluation (reference: src/config.py:62-69)."""

    rounds: int = 20
    num_simulations: int = 500
    c_puct: float = 1.0
    algorithm: str = "puct"  # arena search algorithm ("puct" | "gumbel")
    # gumbel-search hyperparameters (used when algorithm == "gumbel"; same
    # meaning as the MCTSConfig fields — kept separate so evaluation can be
    # tuned independently of self-play, but defaulted from mcts.* by
    # Config.from_dict when the JSON omits them)
    max_considered_actions: int = 16
    c_visit: float = 50.0
    c_scale: float = 0.1
    games_per_pair: int = 2  # per round, colors alternated
    # False = reference semantics: every round dispatches each pairing
    # separately with the first mover alternating by (i+j+round)%2
    # (arena.py:339-341). True = all rounds of a pairing play as ONE
    # batched device call — identical game count, with per-game ELO
    # updates replayed in the same round-interleaved order as the
    # non-batched path; ~rounds-x fewer dispatches (the per-dispatch
    # relay latency dominates small evals; PERF.md). The only semantic
    # difference is the color assignment: an exact half/half split per
    # pairing instead of alternating the first mover by round.
    batch_rounds: bool = False
    # True = play the ENTIRE tournament (every pairing's color-half units,
    # the run_tournament_sharded decomposition) as ONE compiled device
    # program, sharing each half-ply's searches across pairings by
    # searcher model (arena._play_units_parts — for the 3-player promotion
    # gate: 2 merged searches per half-ply at 2x batch instead of 4, and
    # one dispatch instead of three; per-ply fixed costs dominate at
    # gate-sized batches, PERF.md r5). Game counts, per-unit keys, and the
    # ELO replay order are identical to batch_rounds (which this
    # supersedes when both are set); per-unit results match the unmerged
    # path exactly for random players and deterministic play. Multi-process
    # runs compose: each process merges ITS unit shard into one program.
    merge_pairings: bool = False
    # 1-level tree reuse across each side's consecutive searches in a game
    # ("off" | "root" — MCTSConfig.tree_reuse semantics, applied to BOTH
    # sides of every arena match via the grandchild carry,
    # arena._play_pair_parts). Symmetric, so relative ratings stay
    # comparable; per-side asymmetry is a play_pair-level harness feature
    # (tree_reuse_b) used by refbench/reuse_strength.py.
    tree_reuse: str = "off"
    # MCTSConfig.tree_reuse_discount semantics (1.0 = full-weight carry;
    # use ~0.25 under algorithm="puct" — measured, reuse_strength.json)
    tree_reuse_discount: float = 1.0
    temperature: float = 0.1
    output_dir: str = "tournament_results"
    elo_file: str = "elo_ratings.json"
    elo_k_factor: float = 32.0
    elo_initial: float = 1200.0
    promotion_elo_margin: float = 0.0  # new model must beat best by this much


@dataclass
class LoggingConfig:
    """Logging / metrics (reference: src/config.py:71-79)."""

    log_dir: str = "logs"
    log_level: str = "INFO"
    use_tensorboard: bool = True
    save_checkpoints: bool = True
    save_best_only: bool = True
    verbose: bool = True


@dataclass
class MeshConfig:
    """TPU device-mesh layout (no reference analog — the reference is
    single-process; SURVEY.md §2.3). Axis sizes of -1 mean "use all
    remaining devices"."""

    data_axis: int = -1  # self-play games / train batch sharded here
    # model_axis is reserved for tensor parallelism, which is structurally
    # n/a for the flagship 8x8 convnet (~0.7M params; scaling rides the
    # data axis). No program shards over it, so parallel.mesh.make_mesh
    # WARNS on model_axis > 1: the replicas would silently duplicate all
    # work and waste (model_axis-1)/model_axis of those devices.
    model_axis: int = 1


@dataclass
class Config:
    """Top-level config (reference: src/config.py:82-122)."""

    project_name: str = "AlphaZero-Reversi-TPU"
    seed: int = 42
    env_compat: bool = False  # True = replicate reference rule quirks
    model: ModelConfig = field(default_factory=ModelConfig)
    mcts: MCTSConfig = field(default_factory=MCTSConfig)
    self_play: SelfPlayConfig = field(default_factory=SelfPlayConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    tournament: TournamentConfig = field(default_factory=TournamentConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def to_dict(self) -> Dict[str, Any]:
        return asdict(self)

    def save(self, filepath: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(filepath)), exist_ok=True)
        with open(filepath, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        # migrate the reference's temperature-schedule spellings so loading
        # a reference-format JSON keeps their meaning (SURVEY.md §2.4 — the
        # reference declared these and ignored them; we refuse to silently
        # drop user config): mcts.temperature -> self_play.temp_init,
        # mcts.temperature_threshold / self_play.temperature_threshold ->
        # self_play.temp_threshold. Explicit new-style fields win.
        d = dict(d)
        mcts_raw = dict(d.get("mcts", {}))
        sp_raw = dict(d.get("self_play", {}))
        if "temperature" in mcts_raw and "temp_init" not in sp_raw:
            sp_raw["temp_init"] = mcts_raw["temperature"]
        for legacy in (mcts_raw.get("temperature_threshold"),
                       sp_raw.get("temperature_threshold")):
            if legacy is not None and "temp_threshold" not in sp_raw:
                sp_raw["temp_threshold"] = legacy
        d["self_play"] = sp_raw
        # migrate this framework's own pre-multi-leaf default: batch_size=0
        # meant "one leaf per simulation round" before leaf_batch existed;
        # run_search now requires a positive leaf count
        if int(mcts_raw.get("batch_size", 1) or 0) < 1:
            mcts_raw["batch_size"] = 1
        d["mcts"] = mcts_raw
        # tournament gumbel hyperparameters default from the mcts section:
        # a config that tunes mcts.max_considered_actions/c_visit/c_scale
        # evaluates with the same searcher it trains with, unless the
        # tournament section overrides explicitly
        tour_raw = dict(d.get("tournament", {}))
        for field in ("max_considered_actions", "c_visit", "c_scale"):
            if field not in tour_raw and field in mcts_raw:
                tour_raw[field] = mcts_raw[field]
        d["tournament"] = tour_raw

        def sub(section_cls, key):
            raw = dict(d.get(key, {}))
            known = {f.name for f in section_cls.__dataclass_fields__.values()}
            return section_cls(**{k: v for k, v in raw.items() if k in known})

        return cls(
            project_name=d.get("project_name", "AlphaZero-Reversi-TPU"),
            seed=d.get("seed", 42),
            env_compat=d.get("env_compat", False),
            model=sub(ModelConfig, "model"),
            mcts=sub(MCTSConfig, "mcts"),
            self_play=sub(SelfPlayConfig, "self_play"),
            training=sub(TrainingConfig, "training"),
            tournament=sub(TournamentConfig, "tournament"),
            logging=sub(LoggingConfig, "logging"),
            mesh=sub(MeshConfig, "mesh"),
        )

    @classmethod
    def load(cls, filepath: str) -> "Config":
        with open(filepath) as f:
            return cls.from_dict(json.load(f))


def get_default_config() -> Config:
    """Default config with LR milestones derived as in the reference
    (src/config.py:124-134)."""
    config = Config()
    config.training.lr_milestones = [
        config.training.num_epochs // 2,
        3 * config.training.num_epochs // 4,
    ]
    return config
