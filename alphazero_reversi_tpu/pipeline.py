"""Training orchestration: the self-play -> train -> evaluate -> checkpoint
loop.

Replaces ``AlphaZeroPipeline`` (/root/reference/src/trainer/pipeline.py:25-586).
Per outer iteration (the reference calls these "epochs", config
``training.num_epochs``):

1. **Self-play** — one jitted batched program (``selfplay.play_games``)
   instead of the reference's sequential game loop (pipeline.py:152-270).
2. **Replay insert** — positions go into the HBM ring buffer; with
   ``train_on_latest_only`` the buffer is cleared first, replicating the
   reference's train-on-current-iteration-only behavior.
3. **SGD** — ``ceil(new_positions / batch_size)`` jitted train steps (the
   analog of the reference's one epoch over the fresh data,
   pipeline.py:272-366), sampling uniformly from the replay buffer.
4. **Evaluation** — a fresh batched arena of current vs best vs random
   (pipeline.py:368-461); the model is promoted to best when its rating
   exceeds the best model's by ``promotion_elo_margin`` (the gate PLAN.md:160
   declared; the reference's actual rule is margin 0, pipeline.py:454-456).
5. **Checkpoint** — full-state Orbax checkpoint every ``save_interval``
   iterations plus a weights-only best-model save on promotion
   (pipeline.py:463-486), and checkpoint-on-interrupt (pipeline.py:146-147).

Metric names match the reference (pipeline.py:361-366, :458-461):
``train/loss``, ``train/policy_loss``, ``train/value_loss``, ``train/lr``,
``eval/elo``, ``eval/best_elo``.
"""
from __future__ import annotations

import math
import os
import threading
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import arena as arena_lib
from . import checkpoint as ckpt_lib
from . import hostfetch
from . import learner as learner_lib
from . import replay as replay_lib
from . import selfplay as selfplay_lib
from .config import Config
from .logger import Logger, setup_logger
from .models import resnet
from .parallel import dp as dp_lib
from .parallel import mesh as mesh_lib
from .parallel import multihost as mh
from .parallel import replay_sharded as rs_lib


def make_checkpoint_template(config: Config) -> Dict[str, Any]:
    """A concrete pytree with the shapes/dtypes of this config's checkpoints
    (for ``checkpoint.restore_checkpoint`` from outside a pipeline, e.g. the
    tournament CLI)."""
    net = resnet.build_network(config.model)
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    lrn = learner_lib.Learner(net, variables, config.training)
    return {
        "state": lrn.state,
        "best_variables": jax.tree_util.tree_map(jnp.copy, lrn.variables),
        "replay": replay_lib.create(config.training.replay_capacity,
                                    board_size=config.model.board_size),
        "iteration": jnp.int32(0),
        "best_elo": jnp.float32(config.tournament.elo_initial),
        "rng": jax.random.PRNGKey(0),
    }


class AlphaZeroPipeline:
    """End-to-end training pipeline (pipeline.py:25-60 init analog)."""

    def __init__(self, config: Config, run_name: str = "run",
                 logger: Optional[Logger] = None):
        self.config = config
        # multi-controller discipline (parallel.multihost): every process
        # runs the same program over the global mesh with the SAME seed
        # (identical keys -> identical host-side decisions), but only the
        # primary process writes artifacts or logs
        self.is_primary = mh.is_primary()
        self.key = jax.random.PRNGKey(config.seed)

        self.net = resnet.build_network(config.model)
        self.key, init_key = jax.random.split(self.key)
        variables = resnet.init_variables(self.net, init_key)

        # device mesh from config.mesh (data_axis -1 = every visible
        # device). With >1 device the pipeline IS data-parallel: self-play
        # batches shard over the `data` axis (zero-communication SPMD) and
        # SGD runs the explicit-collective DP step (grads/BN stats pmean'd
        # over ICI) — the distributed training the reference only planned
        # (/root/reference/PLAN.md:196). With 1 device both collapse to the
        # single-chip paths.
        self.mesh = mesh_lib.make_mesh(config.mesh)
        self.num_devices = int(np.prod(list(self.mesh.shape.values())))
        deferred_logs = []
        if self.num_devices > 1:
            # batch axes must divide evenly over the data axis; round up
            # rather than crash (logged below once the logger exists)
            d = self.mesh.shape[mesh_lib.DATA_AXIS]
            for section, name in ((config.self_play, "num_parallel_games"),
                                  (config.training, "batch_size")):
                v = getattr(section, name)
                if v % d:
                    new = ((v + d - 1) // d) * d
                    setattr(section, name, new)
                    deferred_logs.append(
                        f"{name} rounded {v} -> {new} to divide the "
                        f"{d}-way data axis")
        if self.num_devices > 1:
            self.learner = dp_lib.DPTrainer(self.net, variables,
                                            config.training, self.mesh)
        else:
            self.learner = learner_lib.Learner(self.net, variables,
                                               config.training)
        # data-axis-sharded replay buffer (TrainingConfig.
        # shard_replay_buffer): shard-local inserts + 1/d HBM per device;
        # meaningless on a 1-device mesh
        self.shard_replay = (config.training.shard_replay_buffer
                             and self.num_devices > 1)
        if self.shard_replay:
            d = self.mesh.shape[mesh_lib.DATA_AXIS]
            rc = rs_lib.rounded_capacity(config.training.replay_capacity, d)
            if rc != config.training.replay_capacity:
                deferred_logs.append(
                    f"replay_capacity rounded "
                    f"{config.training.replay_capacity} -> {rc} to divide "
                    f"the {d}-way data axis (sharded replay)")
                config.training.replay_capacity = rc
            self.buffer = rs_lib.create(self.mesh, rc,
                                        board_size=config.model.board_size)
        else:
            self.buffer = replay_lib.create(
                config.training.replay_capacity,
                board_size=config.model.board_size)
            if mh.is_multiprocess():
                # pin the buffer fully-replicated so replay insert/sample
                # are well-defined global computations and the checkpoint
                # tree is host-fetchable on the primary
                self.buffer = mesh_lib.replicate(
                    self.mesh,
                    jax.tree_util.tree_map(np.asarray, self.buffer))
        self.selfplay = selfplay_lib.SelfPlay(
            self.net, variables, config.mcts, config.self_play,
            compat=config.env_compat)

        # best-so-far model for the promotion gate (best_model.pth analog)
        self.best_variables = jax.tree_util.tree_map(
            jnp.copy, self.learner.variables)
        if mh.is_multiprocess():
            # primary-only read + broadcast (the default checkpointer's
            # restore is a cross-process collective, and non-primary hosts
            # may not even mount the checkpoint store — see
            # load_checkpoint)
            host_template = jax.tree_util.tree_map(
                lambda x: np.zeros(x.shape, x.dtype), self.best_variables)
            restored_best = None
            if self.is_primary:
                restored_best = ckpt_lib.restore_best(
                    config.training.checkpoint_dir, host_template,
                    primary_only=True)
            found = bool(np.asarray(mh.broadcast_from_primary(
                np.float64(0.0 if restored_best is None else 1.0))))
            if found:
                restored_best = mh.broadcast_from_primary(
                    restored_best if restored_best is not None
                    else host_template)
                self.best_variables = mesh_lib.replicate(self.mesh,
                                                         restored_best)
        else:
            restored_best = ckpt_lib.restore_best(
                config.training.checkpoint_dir, self.best_variables)
            if restored_best is not None:
                # re-pin on the mesh: a restored tree is
                # single-device-committed and would clash with the
                # replicated learner state in the eval arena's jit (see
                # load_checkpoint)
                self.best_variables = (
                    mesh_lib.replicate(self.mesh, restored_best)
                    if self.num_devices > 1 else restored_best)

        self.iteration = 0
        self.best_elo = float(config.tournament.elo_initial)
        self.metrics_history: list = []
        # unit indices this process played in the last sharded eval
        # (multi-process only; see _evaluate_model)
        self._last_eval_units: list = []
        # last host snapshot of the replay buffer + save counter (see
        # save_checkpoint / TrainingConfig.replay_checkpoint_interval:
        # freshness is keyed to SAVES, not iterations, so the "every K-th
        # save" contract holds for any save_interval)
        self._replay_host = None
        self._saves_done = 0
        # in-flight background checkpoint fetch+save worker
        # (TrainingConfig.background_checkpoint_fetch); joined before
        # anything that donates the captured buffers (_train_epoch), the
        # next save, restores, and loop exit
        self._bg_save: Optional[threading.Thread] = None
        self._bg_save_error: Optional[BaseException] = None
        # non-primary processes log nothing and write nothing (file_output
        # gates the run dir, training.log, TB, config/model-graph snapshots)
        self.logger = logger or setup_logger(
            config.logging.log_dir, run_name,
            level=config.logging.log_level,
            use_tensorboard=(config.logging.use_tensorboard
                             and self.is_primary),
            verbose=config.logging.verbose and self.is_primary,
            file_output=self.is_primary)
        self.logger.log_config(config.to_dict())
        # model-graph analog (reference: Logger.log_model_graph,
        # src/logger.py:127-130): the tabulated Flax module summary
        try:
            self.logger.log_model_graph(resnet.tabulate_network(self.net))
        except Exception as e:  # tabulate needs rich; never block training
            self.logger.warning("model summary unavailable: %s", e)
        if self.num_devices > 1:
            self.logger.info("data-parallel over %d devices (mesh %s)",
                             self.num_devices, dict(self.mesh.shape))
        for msg in deferred_logs:
            self.logger.warning(msg)

    # -- checkpoint plumbing ----------------------------------------------
    def _checkpoint_tree(self) -> Dict[str, Any]:
        return {
            "state": self.learner.state,
            "best_variables": self.best_variables,
            "replay": self.buffer,
            "iteration": jnp.int32(self.iteration),
            "best_elo": jnp.float32(self.best_elo),
            "rng": self.key,
        }

    def _restore_template(self) -> Dict[str, Any]:
        """Shapes/dtypes of what checkpoints STORE: like the live tree,
        except the replay buffer is always the canonical scalar-cursor
        layout (sharded-mode saves canonicalize before writing)."""
        tree = self._checkpoint_tree()
        if self.shard_replay:
            tree = dict(tree)
            tree["replay"] = replay_lib.create(
                self.config.training.replay_capacity,
                board_size=self.config.model.board_size)
        return tree

    def _join_bg_save(self) -> None:
        """Wait for the in-flight background checkpoint worker (if any) and
        surface any error it hit (incl. FetchTimeoutError). Called before
        anything that donates the buffers the worker captured — the scanned
        SGD in ``_train_epoch`` — and before the next save/restore/exit."""
        worker = self._bg_save
        if worker is None:
            return
        worker.join()
        self._bg_save = None
        if self._bg_save_error is not None:
            err, self._bg_save_error = self._bg_save_error, None
            raise err

    def _finish_save(self, tree: Dict[str, Any], due: bool, interval: int,
                     timeout, use_async: bool, iteration: int,
                     local: bool = False) -> str:
        """Fetch burst + orbax save (+ prune/log) — runs inline on the main
        thread, or on the background worker when
        ``TrainingConfig.background_checkpoint_fetch`` is on. Reads ONLY
        the captured ``tree`` references (never ``self.buffer``/``state``,
        which the main thread may rebind while the worker runs).

        ``local=True`` is the multi-process background mode: the tree is
        host-fetched via the COLLECTIVE-FREE
        ``multihost.fetch_replicated_local`` (each replicated leaf's local
        shard copy), so this can run on the primary's worker thread without
        interleaving with the main thread's collectives."""
        tree = dict(tree)
        if interval > 1 and not due:
            tree["replay"] = self._replay_host
        if local:
            tree = hostfetch.guarded(
                lambda: mh.fetch_replicated_local(tree), timeout,
                what="checkpoint local fetch")
            if interval > 1 and due:
                self._replay_host = tree["replay"]
        elif due and (interval > 1 or self.shard_replay):
            # sharded replay always pre-fetches here so the checkpoint can
            # store the CANONICAL scalar-cursor layout (portable across
            # topologies/modes); the fetch cost is the same burst the orbax
            # save would have paid
            host_replay = hostfetch.device_get(
                tree["replay"], timeout, what="replay buffer fetch")
            if self.shard_replay:
                host_replay = rs_lib.canonicalize_host(host_replay)
            self._replay_host = host_replay
            tree["replay"] = host_replay
        path = ckpt_lib.save_checkpoint(
            self.config.training.checkpoint_dir, iteration, tree,
            primary_only=True, async_save=use_async,
            fetch_timeout_s=timeout)
        self.logger.info("checkpoint %s: %s (host fetch %.2fs)",
                         "save scheduled (async)" if use_async
                         else "saved", path,
                         hostfetch.last_fetch_seconds())
        if self.config.logging.save_best_only:
            # keep only the latest full checkpoint + the best-model
            # weights (LoggingConfig.save_best_only semantics — see
            # checkpoint.prune_checkpoints). An in-flight async save is
            # invisible here (orbax finalizes the it_NNNNNN name last),
            # so this keeps the previous finalized checkpoint until the
            # new one is durable — there is always >=1 complete
            # checkpoint on disk; train() prunes once more after the
            # final wait.
            for old in ckpt_lib.prune_checkpoints(
                    self.config.training.checkpoint_dir, keep_latest=1):
                self.logger.info("pruned old checkpoint: %s", old)
        return path

    def save_checkpoint(self, fresh_replay: bool = False) -> str:
        self._join_bg_save()  # at most one worker in flight
        tree = self._checkpoint_tree()
        timeout = self.config.training.fetch_timeout_s or None
        # the replay buffer dominates the checkpoint fetch (~92 of ~95 MB
        # at flagship capacity); with replay_checkpoint_interval K > 1 only
        # every K-th save fetches it fresh — the others reuse the last host
        # snapshot. Keyed to the save COUNT (not the iteration number) so
        # "every K-th save" holds whatever save_interval is; `due` depends
        # only on state every process evolves identically, so the
        # multi-process branch below cannot diverge across hosts.
        interval = max(1, self.config.training.replay_checkpoint_interval)
        # `due` must depend only on state every process evolves identically
        # (_saves_done), never on per-process state like _replay_host — in
        # multi-process background mode only the primary holds a snapshot,
        # and a due-ness divergence would make processes issue DIFFERENT
        # collectives in the synchronous fallback (deadlock)
        due = (interval == 1 or fresh_replay or self._saves_done == 0
               or self._saves_done % interval == 0)
        use_async = self.config.training.async_checkpointing
        background = (use_async
                      and self.config.training.background_checkpoint_fetch)
        if background and mh.is_multiprocess() \
                and not mh.all_leaves_replicated(tree):
            # metadata-only check, identical on every process (same
            # shardings) — the fallback decision cannot diverge
            background = False
        if background:
            # background fetch+save: capture the device references now (jax
            # arrays are immutable; the pipeline only rebinds state/buffer)
            # and let the worker overlap the fetch burst with the next
            # iteration's self-play. _join_bg_save() runs before anything
            # that DONATES the captured buffers (_train_epoch).
            #
            # Multi-process: the PRIMARY alone fetches (collective-free
            # local-shard reads — the worker must never issue a collective
            # that could interleave with the main thread's) and writes;
            # non-primaries schedule nothing. No post-save barrier: with
            # async saves the finalized-before-read guarantee already lives
            # at restore time (load_checkpoint waits + broadcasts).
            self._saves_done += 1
            iteration = self.iteration
            path = ckpt_lib.checkpoint_path(
                self.config.training.checkpoint_dir, iteration)
            if not self.is_primary:
                return path
            local = mh.is_multiprocess()

            def work():
                try:
                    self._finish_save(tree, due, interval, timeout,
                                      True, iteration, local=local)
                except BaseException as e:  # surfaced at the next join
                    self._bg_save_error = e

            worker = threading.Thread(target=work, daemon=True,
                                      name=f"bgsave:{iteration}")
            self._bg_save = worker
            worker.start()
            return path
        if mh.is_multiprocess():
            # replicated state -> host numpy on every process (cheap: the
            # all-gather is a no-op for replicated leaves), then ONE writer
            if interval > 1 and not due:
                rest = {k: v for k, v in tree.items() if k != "replay"}
                tree = hostfetch.guarded(
                    lambda: mh.fetch_replicated(self.mesh, rest), timeout,
                    what="replicated checkpoint fetch (replay reused)")
                tree["replay"] = self._replay_host
            else:
                tree = hostfetch.guarded(
                    lambda: mh.fetch_replicated(self.mesh, tree), timeout,
                    what="replicated checkpoint fetch")
                if self.shard_replay:
                    # the gather above is the design's one buffer
                    # collective ("gather only at checkpoint time");
                    # canonicalize for the portable checkpoint layout
                    tree["replay"] = rs_lib.canonicalize_host(
                        tree["replay"])
                if interval > 1:
                    self._replay_host = tree["replay"]
        else:
            # inline single-controller path: same worker body, main thread
            self._saves_done += 1
            return self._finish_save(tree, due, interval, timeout,
                                     use_async, self.iteration)
        self._saves_done += 1
        path = ckpt_lib.checkpoint_path(
            self.config.training.checkpoint_dir, self.iteration)
        # async saves overlap the disk write with the next iteration — on
        # multi-process runs too (r4): the tree is already host numpy on
        # every process, the primary alone schedules the orbax write, and
        # the finalized-before-read guarantee moves to restore time
        # (load_checkpoint waits for in-flight saves on the primary and
        # barriers before anyone lists the directory)
        if self.is_primary:
            path = ckpt_lib.save_checkpoint(
                self.config.training.checkpoint_dir, self.iteration, tree,
                primary_only=True, async_save=use_async,
                fetch_timeout_s=timeout)
            self.logger.info("checkpoint %s: %s (host fetch %.2fs)",
                             "save scheduled (async)" if use_async
                             else "saved", path,
                             hostfetch.last_fetch_seconds())
            if self.config.logging.save_best_only:
                # see _finish_save's prune note: the in-flight async save
                # is invisible to prune until finalized
                for old in ckpt_lib.prune_checkpoints(
                        self.config.training.checkpoint_dir, keep_latest=1):
                    self.logger.info("pruned old checkpoint: %s", old)
        # everyone aligns on the scheduled save (sync saves: on the
        # finished write). With async saves the checkpoint may still be
        # writing past this barrier — readers are protected at restore
        # time instead (load_checkpoint / train-exit wait_for_saves)
        mh.barrier(f"save_checkpoint_{self.iteration}")
        return path

    def load_checkpoint(self, path: Optional[str] = None) -> bool:
        """Restore full training state; ``path=None`` loads the latest
        (pipeline.py:488-559 / run.py --resume analog).

        Multi-controller: the PRIMARY alone reads the checkpoint store
        (``restore_checkpoint(primary_only=True)`` — its wait_for_saves
        also finalizes any in-flight async write first) and broadcasts the
        host tree to every process. Two things this buys: non-primary
        hosts never need the checkpoint storage mounted at all, and the
        read can never race an async save or diverge on directory listings
        (the broadcast IS the synchronization)."""
        self._join_bg_save()
        if mh.is_multiprocess():
            # host-numpy template: the primary restores WITHOUT any global
            # sharding in the abstract tree (a device template would make
            # orbax rebuild global arrays, which blocks on the absent
            # peers), and the same zeros tree is the non-primaries'
            # structure donor for the broadcast
            host_template = jax.tree_util.tree_map(
                lambda x: np.zeros(x.shape, x.dtype),
                self._restore_template())
            tree_host = None
            if self.is_primary:
                p = path if path is not None else ckpt_lib.latest_checkpoint(
                    self.config.training.checkpoint_dir)
                if p is not None:
                    tree_host = ckpt_lib.restore_checkpoint(
                        p, host_template, primary_only=True)
                    path = p
            found = bool(np.asarray(mh.broadcast_from_primary(
                np.float64(0.0 if tree_host is None else 1.0))))
            if not found:
                return False
            if tree_host is None:
                tree_host = host_template
                path = "<broadcast from primary>"
            restored = mh.broadcast_from_primary(tree_host)
        else:
            if path is None:
                path = ckpt_lib.latest_checkpoint(
                    self.config.training.checkpoint_dir)
            if path is None:
                return False
            restored = ckpt_lib.restore_checkpoint(path,
                                                   self._restore_template())
        state = learner_lib.TrainState(*restored["state"]) \
            if not isinstance(restored["state"], learner_lib.TrainState) \
            else restored["state"]
        best_variables = restored["best_variables"]
        buffer = replay_lib.ReplayBuffer(*restored["replay"]) \
            if not isinstance(restored["replay"], replay_lib.ReplayBuffer) \
            else restored["replay"]
        key = restored["rng"]
        if mh.is_multiprocess():
            # re-pin everything fully-replicated over the global mesh (the
            # restored leaves may be host- or process-local); a sharded
            # replay buffer instead re-distributes the canonical host form
            # over the data axis
            state, best_variables, key = mesh_lib.replicate(
                self.mesh, mh.fetch_replicated(
                    self.mesh, (state, best_variables, key)))
            buffer = (rs_lib.shard_host(self.mesh, buffer)
                      if self.shard_replay else
                      mesh_lib.replicate(self.mesh, mh.fetch_replicated(
                          self.mesh, buffer)))
        elif self.num_devices > 1:
            # orbax restores single-device-committed arrays; EVERYTHING the
            # mesh programs consume must be re-replicated or jit rejects the
            # mixed placements ("incompatible devices") — state for the DP
            # step, the buffer for scanned sampling, best_variables for the
            # eval arena, and the rng key threading through sharded
            # self-play (caught by the r4 CLI `continue` drive)
            state, best_variables, key = mesh_lib.replicate(
                self.mesh, (state, best_variables, key))
            buffer = (rs_lib.shard_host(
                self.mesh, jax.tree_util.tree_map(np.asarray, buffer))
                if self.shard_replay else
                mesh_lib.replicate(self.mesh, buffer))
        self.learner.state = state
        self.best_variables = best_variables
        self.buffer = buffer
        self._replay_host = None  # pre-restore snapshot is no longer valid
        self._saves_done = 0  # restart the every-K-th-save cadence
        self.iteration = int(restored["iteration"])
        self.best_elo = float(restored["best_elo"])
        self.key = key
        self.logger.info("resumed from %s at iteration %d", path,
                         self.iteration)
        return True

    # -- phases -------------------------------------------------------------
    def _generate_self_play_data(self) -> int:
        """Self-play + replay insert; returns number of new positions
        (pipeline.py:152-270 analog). Plays ``ceil(num_games /
        num_parallel_games)`` jitted batches of ``num_parallel_games``
        lockstep games — the per-iteration game budget the reference
        declared (src/config.py:33) but served with a sequential loop.
        Trajectories are persisted to ``self_play.save_dir`` every
        ``save_every`` iterations (the batch analog of the reference's
        per-game torch.save, self_play.py:129)."""
        sp_cfg = self.config.self_play
        self.selfplay.variables = self.learner.variables
        if self.config.training.train_on_latest_only:
            self.buffer = (rs_lib.reset(self.buffer) if self.shard_replay
                           else replay_lib.reset(self.buffer))
        num_batches = max(1, math.ceil(sp_cfg.num_games
                                       / sp_cfg.num_parallel_games))
        new_positions = 0
        total_slots = 0
        relabel_stats: Dict[str, float] = {}
        for b in range(num_batches):
            self.key, sp_key = jax.random.split(self.key)
            if self.num_devices > 1:
                traj = dp_lib.sharded_play_games(
                    self.net, self.learner.variables, sp_key, self.mesh,
                    num_games=sp_cfg.num_parallel_games,
                    **selfplay_lib.search_kwargs(
                        self.config.mcts, sp_cfg, self.config.env_compat))
            else:
                traj = self.selfplay.generate_games(
                    sp_key, sp_cfg.num_parallel_games)
            if sp_cfg.exact_value_empties > 0:
                # ground-truth value labels for late positions (native
                # endgame solver) replace the realized outcome; cost is
                # wall-clock-bounded and surfaced in the iteration metrics.
                # Multi-controller: each process solves its own game shard
                # (parallel.multihost.relabel_sharded)
                budget = (sp_cfg.exact_value_budget_s
                          if sp_cfg.exact_value_budget_s > 0 else None)
                timeout = self.config.training.fetch_timeout_s or None
                if mh.is_multiprocess():
                    traj, rstats = mh.relabel_sharded(
                        self.mesh, traj, sp_cfg.exact_value_empties,
                        self.config.env_compat, budget,
                        fetch_timeout_s=timeout)
                else:
                    traj, rstats = \
                        selfplay_lib.relabel_exact_values_with_stats(
                            traj, sp_cfg.exact_value_empties,
                            compat=self.config.env_compat, budget_s=budget,
                            fetch_timeout_s=timeout)
                for k, v in rstats.items():
                    # sum counts across self-play batches, but keep max
                    # semantics for extremum fields (matches
                    # multihost.aggregate_stats's cross-process rule)
                    if k == "max_empties_solved":
                        relabel_stats[k] = max(relabel_stats.get(k, 0), v)
                    else:
                        relabel_stats[k] = relabel_stats.get(k, 0) + v
                if rstats["skipped"]:
                    self.logger.warning(
                        "exact-value relabel budget (%.0fs) hit: %d/%d "
                        "candidates kept realized labels (deepest solved: "
                        "%d empties)", sp_cfg.exact_value_budget_s,
                        rstats["skipped"], rstats["candidates"],
                        rstats["max_empties_solved"])
            if (sp_cfg.save_every > 0
                    and self.iteration % sp_cfg.save_every == 0):
                timeout = self.config.training.fetch_timeout_s or None
                to_save = traj
                if mh.is_multiprocess():
                    # gather the sharded batch; only the primary persists
                    to_save = hostfetch.guarded(
                        lambda: mh.fetch_replicated(self.mesh, traj),
                        timeout, what="trajectory gather")
                if self.is_primary:
                    hostfetch.guarded(
                        lambda: selfplay_lib.save_trajectory(
                            to_save, sp_cfg.save_dir,
                            f"it{self.iteration:06d}_b{b}"),
                        timeout, what="trajectory fetch+save")
            if self.shard_replay:
                # shard-local ring insert of the [T, B] batch (games axis
                # over data) — ZERO communication, vs the replicated
                # buffer's per-iteration trajectory gather. Pre-pin the
                # trajectory to the canonical [T, B@data] layout first (a
                # no-op when XLA already chose it) so the shard_map's
                # in_specs can't force a reshard collective.
                tb = lambda x: mh.canonical_tb_sharding(self.mesh, x)
                self.buffer = rs_lib.add(
                    self.mesh, self.buffer, tb(traj.planes),
                    tb(traj.policy), tb(traj.value), tb(traj.valid))
                new_positions += int(np.asarray(jnp.sum(traj.valid)))
                total_slots += int(np.prod(traj.valid.shape))
            else:
                planes, policy, value, valid = \
                    selfplay_lib.flatten_trajectory(traj)
                self.buffer = replay_lib.add(self.buffer, planes, policy,
                                             value, valid)
                new_positions += int(valid.sum())
                total_slots += int(valid.size)
        if mh.is_multiprocess() and not self.shard_replay:
            # re-pin the buffer fully-replicated: GSPMD may have chosen a
            # sharded layout for the insert's output, and sample/checkpoint
            # assume replicated
            self.buffer = jax.device_put(self.buffer,
                                         mesh_lib.replicated(self.mesh))
        # lockstep waste visibility: fraction of searched (slot, game) cells
        # that were live games (PERF.md "self-play tail" note)
        self._last_live_fraction = new_positions / max(1, total_slots)
        self._last_relabel_stats = relabel_stats
        return new_positions

    def _train_epoch(self, num_positions: int) -> Dict[str, float]:
        """One pass of SGD over the fresh data volume
        (pipeline.py:272-366 analog). With ``steps_per_dispatch > 1``, SGD
        runs in scanned chunks — K steps per compiled dispatch, sampling
        on-device (``learner.train_steps`` single-device,
        ``parallel.dp.make_dp_train_steps`` on a multi-device mesh) — which
        amortizes per-dispatch relay latency; the step budget rounds up to
        whole chunks."""
        # the scanned SGD donates the learner state a background checkpoint
        # worker may still be fetching — the join is the donation barrier
        self._join_bg_save()
        cfg = self.config.training
        steps = max(1, math.ceil(num_positions / cfg.batch_size))
        chunk = max(1, int(cfg.steps_per_dispatch))
        # metrics accumulate ON DEVICE and come back in ONE fetch at the
        # end: a per-chunk float() would serialize the dispatch loop on
        # ~0.1 s relay round-trips each (the probe shows the 480-step SGD
        # itself is ~0.33 s with dispatches left free to pipeline —
        # refbench/sgd_chunk_probe.py, PERF.md r4)
        acc = None

        def accumulate(aux):
            nonlocal acc
            acc = aux if acc is None else jax.tree_util.tree_map(
                jnp.add, acc, aux)

        # the sharded buffer samples INSIDE the scanned DP program
        # (per-shard pools); the host-side replay_lib.sample fallback below
        # assumes a replicated buffer, so sharded mode always routes
        # through the scanned path (chunk >= 1)
        if chunk > 1 or self.shard_replay:
            n_chunks = math.ceil(steps / chunk)
            steps = n_chunks * chunk
            for _ in range(n_chunks):
                self.key, k = jax.random.split(self.key)
                accumulate(self.learner.steps(self.buffer, k, chunk,
                                              cfg.batch_size))
            host = jax.device_get(acc)
            return ({k: float(v) / n_chunks for k, v in host.items()}
                    | {"steps": steps})
        for _ in range(steps):
            self.key, sample_key, dropout_key = jax.random.split(self.key, 3)
            batch = replay_lib.sample(self.buffer, sample_key, cfg.batch_size)
            accumulate(self.learner.step(*batch, dropout_rng=dropout_key))
        host = jax.device_get(acc)
        return {k: float(v) / steps for k, v in host.items()} \
            | {"steps": steps}

    def _evaluate_model(self) -> Dict[str, float]:
        """Fresh tournament: current vs best vs random
        (pipeline.py:368-461 analog). Returns eval metrics and applies the
        promotion gate."""
        cfg = self.config.tournament
        # device-parallel eval (VERDICT r4 item 1): single-controller runs
        # shard each match's game batch over the pipeline mesh;
        # multi-process runs shard each process's tournament units over its
        # LOCAL submesh (the units themselves are process-sharded below)
        eval_mesh = (mesh_lib.local_mesh() if mh.is_multiprocess()
                     else self.mesh)
        ar = arena_lib.Arena(self.net, cfg, compat=self.config.env_compat,
                             mesh=eval_mesh)
        cur_vars, best_vars = self.learner.variables, self.best_variables
        if mh.is_multiprocess():
            # host copies of the replicated weights: each process runs its
            # SHARD of the arena as a process-local computation
            cur_vars, best_vars = mh.fetch_replicated(
                self.mesh, (cur_vars, best_vars))
        ar.add_player("current", cur_vars)
        ar.add_player("best", best_vars)
        ar.add_player("random", None)
        self.key, t_key = jax.random.split(self.key)
        if mh.is_multiprocess():
            # sharded evaluation (VERDICT r3 item 3): each process plays
            # only its (pairing, color-half) units on its local devices,
            # per-game scores are allgathered, and every process replays
            # the ELO updates in the canonical order — identical
            # leaderboards by construction, ~1/P of the search work per
            # process instead of P-duplicated full arenas; the decision is
            # still broadcast from the primary below so promotion can
            # never diverge across hosts (VERDICT r2 item 2)
            leaderboard = ar.run_tournament_sharded(
                t_key, jax.process_index(), jax.process_count(),
                gather=mh.gather_unit_scores)
            self._last_eval_units = list(ar.units_played)
        else:
            leaderboard = ar.run_tournament(t_key)
        board = {p["player_id"]: p["rating"] for p in leaderboard}
        current_elo = board["current"]
        promoted = current_elo > board["best"] + cfg.promotion_elo_margin
        decision = mh.broadcast_from_primary(np.asarray(
            [current_elo, board["best"], board["random"], float(promoted)],
            np.float64))
        current_elo, best_board_elo, random_elo, promoted = (
            float(decision[0]), float(decision[1]), float(decision[2]),
            bool(decision[3]))
        if promoted:
            self.best_variables = jax.tree_util.tree_map(
                jnp.copy, self.learner.variables)
            self.best_elo = current_elo
            if self.is_primary:
                best_host = (mh.fetch_replicated(self.mesh,
                                                 self.best_variables)
                             if mh.is_multiprocess() else
                             self.best_variables)
                ckpt_lib.save_best(
                    self.config.training.checkpoint_dir, best_host,
                    primary_only=True,
                    async_save=self.config.training.async_checkpointing,
                    fetch_timeout_s=(self.config.training.fetch_timeout_s
                                     or None))
            self.logger.info("model promoted to best (elo %.1f > %.1f)",
                             current_elo, best_board_elo)
        return {"eval/elo": current_elo, "eval/best_elo": self.best_elo,
                "eval/random_elo": random_elo,
                "eval/promoted": float(promoted)}

    def _log_replay_embedding(self, step: int, n: int = 256) -> None:
        """TB-projector embedding of a replay sample (reference
        Logger.log_embedding capability, src/logger.py:101-120): flattened
        canonical planes of up to ``n`` buffered positions, labeled by their
        value target. Skipped when TensorBoard is off or the buffer is
        empty.

        The sampling key is DERIVED (``fold_in`` of a constant tag + step)
        from the training stream without advancing it — logging must never
        perturb training: the same seed produces bit-identical trajectories
        whether TensorBoard is on or off, and a resumed run's key stream
        matches the uninterrupted one (this runs after ``save_checkpoint``
        snapshots ``self.key``; VERDICT r3 weak 3,
        tests/test_pipeline.py rng-isolation tests)."""
        if not self.config.logging.use_tensorboard \
                or not rs_lib.total_size(self.buffer):
            return
        if self.shard_replay:
            # replay_lib.sample assumes the replicated scalar-cursor
            # layout; the TB projector embedding is diagnostic-only, so
            # sharded-buffer runs skip it rather than gather the buffer
            return
        k = jax.random.fold_in(jax.random.fold_in(self.key, 0x10C), step)
        planes, _, value = replay_lib.sample(
            self.buffer, k, min(n, int(self.buffer.size)))
        flat = np.asarray(planes).reshape(planes.shape[0], -1)
        labels = [f"v={v:+.2f}" for v in np.asarray(value)]
        self.logger.log_embedding("replay/positions", flat,
                                  metadata=labels, step=step)

    # -- main loop ----------------------------------------------------------
    def train(self, num_iterations: Optional[int] = None) -> None:
        """Run the training loop (pipeline.py:114-150)."""
        total = (num_iterations if num_iterations is not None
                 else self.config.training.num_epochs)
        try:
            while self.iteration < total:
                it = self.iteration
                t0 = time.time()
                self.learner.set_iteration(it)

                n_new = self._generate_self_play_data()
                t_sp = time.time()
                train_metrics = self._train_epoch(n_new)
                t_tr = time.time()
                eval_metrics = self._evaluate_model()
                t_ev = time.time()

                metrics = {
                    "train/loss": train_metrics["loss"],
                    "train/policy_loss": train_metrics["policy_loss"],
                    "train/value_loss": train_metrics["value_loss"],
                    "train/lr": learner_lib.current_learning_rate(
                        self.learner.state),
                    "train/grad_norm": train_metrics["grad_norm"],
                    "selfplay/positions": n_new,
                    "selfplay/live_fraction": self._last_live_fraction,
                    "selfplay/seconds": t_sp - t0,
                    "train/seconds": t_tr - t_sp,
                    "eval/seconds": t_ev - t_tr,
                    "replay/size": rs_lib.total_size(self.buffer),
                    **eval_metrics,
                }
                if self._last_relabel_stats:
                    metrics.update({
                        f"selfplay/relabel_{k}": v
                        for k, v in self._last_relabel_stats.items()})
                self.metrics_history.append(metrics)
                self.logger.log_metrics(metrics, it)
                # per-group LR scalar (reference Logger.log_learning_rate,
                # src/logger.py:132-136; optax has one param group)
                self.logger.log_learning_rate(metrics["train/lr"], it)

                self.iteration = it + 1
                if (self.config.logging.save_checkpoints
                        and self.iteration
                        % self.config.training.save_interval == 0):
                    # the run's final checkpoint always carries the live
                    # buffer, whatever replay_checkpoint_interval says
                    self.save_checkpoint(fresh_replay=self.iteration >= total)
                    self._log_replay_embedding(it)
        except KeyboardInterrupt:
            # save-on-interrupt (pipeline.py:146-147, run.py:84-89);
            # fresh_replay: an interrupt save must carry the live buffer
            # even mid replay_checkpoint_interval
            self.logger.warning("interrupted — saving checkpoint")
            try:  # a failed background save must not block the rescue save
                self._join_bg_save()
            except BaseException as e:
                self.logger.error("background checkpoint save failed: %s", e)
            self.save_checkpoint(fresh_replay=True)
            raise
        finally:
            # finalize any in-flight background fetch worker and async
            # save, then prune the now-stale previous checkpoint the
            # in-loop prune had to keep
            try:
                self._join_bg_save()
            except BaseException as e:
                self.logger.error("background checkpoint save failed: %s", e)
            ckpt_lib.wait_for_saves()
            if (self.is_primary and self.config.logging.save_checkpoints
                    and self.config.logging.save_best_only):
                for old in ckpt_lib.prune_checkpoints(
                        self.config.training.checkpoint_dir, keep_latest=1):
                    self.logger.info("pruned old checkpoint: %s", old)


def train_from_config(config: Config, run_name: str = "run",
                      resume: bool = False) -> AlphaZeroPipeline:
    """CLI entry helper (pipeline.py:561-586 analog)."""
    pipe = AlphaZeroPipeline(config, run_name=run_name)
    if resume:
        pipe.load_checkpoint()
    pipe.train()
    return pipe
