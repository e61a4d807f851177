"""Data-parallel training and self-play over a device mesh.

The TPU-native replacement for the distributed training the reference only
gestured at (PLAN.md:196 "Implement distributed training"; SURVEY.md §2.3).
Two pieces:

* **Sharded self-play** — the env batch is placed sharded over the mesh's
  ``data`` axis and ``selfplay.play_games`` runs unchanged: every op in the
  program is batch-elementwise or a per-game vmap, so XLA partitions the
  whole search with zero communication (the NN forward's weights are
  replicated; activations stay shard-local).

* **Explicit-collective DP train step** — ``jax.shard_map`` over the mesh:
  each shard computes gradients and BatchNorm statistics on its local batch,
  then ``lax.pmean`` over the ``data`` axis reduces both across chips (over
  ICI within a slice, DCN across hosts), and the optimizer update runs
  replicated. Cross-replica BN-stat averaging is something the reference's
  (nonexistent) DDP would not even do.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from .. import learner as learner_lib
from .. import selfplay as selfplay_lib
from ..env import bitboard as env
from . import mesh as mesh_lib


def sharded_initial_states(mesh: Mesh, num_games: int) -> env.EnvState:
    """Standard starting positions, batch-sharded over the data axis."""
    states = env.initial_state((num_games,))
    return mesh_lib.shard_batch(mesh, states)


def sharded_play_games(net, variables: Dict[str, Any], key: jax.Array,
                       mesh: Mesh, *, num_games: int,
                       **kwargs) -> selfplay_lib.Trajectory:
    """Self-play with the game batch sharded across the mesh.

    ``num_games`` must be divisible by the data-axis size. ``kwargs`` are
    ``selfplay.play_games``'s search/schedule parameters.
    """
    if num_games % mesh.shape[mesh_lib.DATA_AXIS] != 0:
        raise ValueError(
            f"num_games={num_games} not divisible by data axis "
            f"{mesh.shape[mesh_lib.DATA_AXIS]}")
    variables = mesh_lib.replicate(mesh, variables)
    init_states = sharded_initial_states(mesh, num_games)
    return selfplay_lib.play_games(net, variables, key,
                                   num_games=num_games,
                                   init_states=init_states, **kwargs)


def make_dp_train_step(net, tx: optax.GradientTransformation, mesh: Mesh, *,
                       policy_loss: str = "soft", policy_weight: float = 1.0,
                       value_weight: float = 1.0,
                       augment_symmetries: bool = False):
    """Build a jitted DP train step: grads/BN stats pmean'd over ``data``.

    Returned signature: ``(state, planes, policy_tgt, value_tgt, rng)
    -> (state, aux)`` with ``state`` replicated and the batch arrays sharded
    on their leading axis.
    """

    def local_step(state: learner_lib.TrainState, planes, policy_tgt,
                   value_tgt, rng):
        # decorrelate dropout across shards
        rng = jax.random.fold_in(rng, jax.lax.axis_index(mesh_lib.DATA_AXIS))
        grad_fn = jax.value_and_grad(
            lambda p: learner_lib.loss_fn(
                net, p, state.batch_stats, planes, policy_tgt, value_tgt,
                policy_loss=policy_loss, policy_weight=policy_weight,
                value_weight=value_weight, dropout_rng=rng,
                augment_symmetries=augment_symmetries),
            has_aux=True)
        (_, (aux, new_batch_stats)), grads = grad_fn(state.params)
        grads = jax.lax.pmean(grads, mesh_lib.DATA_AXIS)
        new_batch_stats = jax.lax.pmean(new_batch_stats, mesh_lib.DATA_AXIS)
        aux = jax.lax.pmean(aux, mesh_lib.DATA_AXIS)
        aux["grad_norm"] = optax.global_norm(grads)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = learner_lib.TrainState(
            params=new_params, batch_stats=new_batch_stats,
            opt_state=new_opt_state, step=state.step + 1)
        return new_state, aux

    shmapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(mesh_lib.DATA_AXIS), P(mesh_lib.DATA_AXIS),
                  P(mesh_lib.DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(shmapped, donate_argnums=(0,))


class DPTrainer:
    """Mesh-aware analog of ``learner.Learner``."""

    def __init__(self, net, variables: Dict[str, Any], cfg, mesh: Mesh):
        self.net = net
        self.cfg = cfg
        self.mesh = mesh
        self.tx = learner_lib.make_optimizer(cfg)
        self.state = mesh_lib.replicate(
            mesh, learner_lib.create_train_state(net, variables, cfg))
        self._step = make_dp_train_step(
            net, self.tx, mesh, policy_loss=cfg.policy_loss,
            policy_weight=cfg.policy_loss_weight,
            value_weight=cfg.value_loss_weight,
            augment_symmetries=cfg.augment_symmetries)

    @property
    def variables(self) -> Dict[str, Any]:
        return learner_lib.variables_of(self.state)

    def set_iteration(self, iteration: int) -> None:
        self.state = learner_lib.set_learning_rate(
            self.state, learner_lib.lr_at_iteration(self.cfg, iteration))

    def step(self, planes, policy_tgt, value_tgt,
             dropout_rng: Optional[jax.Array] = None
             ) -> Dict[str, jax.Array]:
        if dropout_rng is None:
            dropout_rng = jax.random.PRNGKey(0)
        batch = mesh_lib.shard_batch(self.mesh,
                                     (planes, policy_tgt, value_tgt))
        self.state, aux = self._step(self.state, *batch, dropout_rng)
        return aux
