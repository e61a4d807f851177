"""AlphaZero ResNet policy/value network, TPU-native (Flax/Linen).

Architecturally equivalent to the reference's PyTorch net
(/root/reference/src/model/network.py:30-117): initial 3x3 conv + BN + ReLU,
``num_res_blocks`` residual blocks (2x [3x3 conv + BN], ReLU, skip), a policy
head (1x1 conv -> 2ch -> BN -> ReLU -> FC -> 65 logits = 64 squares + pass)
and a value head (1x1 conv -> 1ch -> BN -> ReLU -> FC -> hidden -> ReLU ->
FC -> tanh). TPU-first differences:

* **NHWC layout** (``[B, 8, 8, 3]``) — the native TPU convolution layout —
  instead of the reference's NCHW.
* **bfloat16 compute, float32 params** by default: convolutions and matmuls
  run on the MXU in bf16; batch-norm statistics and the heads' final outputs
  are kept in float32.
* Config fields the reference declared but ignored
  (``value_head_hidden_size``, ``dropout`` — SURVEY.md §2.4) are honored.

There is no TorchScript-style ``compile()`` lifecycle (network.py:119-194):
under JAX every ``jit``-wrapped apply is compiled by XLA, so the whole
JIT-invalidation state machine the reference needs disappears.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig

NUM_ACTIONS = 65


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


class ResBlock(nn.Module):
    """Residual block (reference: network.py:14-28)."""

    filters: int
    dtype: Any = jnp.bfloat16
    use_batch_norm: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        bias = not self.use_batch_norm
        y = nn.Conv(self.filters, (3, 3), use_bias=bias, dtype=self.dtype,
                    name="conv1")(x)
        if self.use_batch_norm:
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), use_bias=bias, dtype=self.dtype,
                    name="conv2")(y)
        if self.use_batch_norm:
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name="bn2")(y)
        return nn.relu(y + x)


class AlphaZeroNet(nn.Module):
    """Policy/value net (reference: network.py:30-117). Input NHWC."""

    num_res_blocks: int = 5
    num_filters: int = 128
    value_head_hidden_size: int = 256
    policy_head_channels: int = 2
    value_head_channels: int = 1
    dropout: float = 0.0
    board_size: int = 8
    dtype: Any = jnp.bfloat16
    # BatchNorm everywhere, like the reference (network.py:97-115). False
    # swaps every BN for a conv bias: no batch statistics at all, so the
    # DP train step is bit-equivalent to large-batch single-device SGD
    # (per-shard BN statistics are the only DP-vs-single divergence; see
    # __graft_entry__.dryrun_multichip's exact leg) — also the standard
    # choice when per-shard batches are too small for stable BN stats.
    use_batch_norm: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        """x: [B, board, board, 3] float planes -> (logits [B, 65], value [B])."""
        bias = not self.use_batch_norm
        x = x.astype(self.dtype)
        x = nn.Conv(self.num_filters, (3, 3), use_bias=bias, dtype=self.dtype,
                    name="stem_conv")(x)
        if self.use_batch_norm:
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name="stem_bn")(x)
        x = nn.relu(x)

        for i in range(self.num_res_blocks):
            x = ResBlock(self.num_filters, dtype=self.dtype,
                         use_batch_norm=self.use_batch_norm,
                         name=f"res{i}")(x, train)

        if self.dropout > 0.0:
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)

        # Policy head (network.py:104-108)
        p = nn.Conv(self.policy_head_channels, (1, 1), use_bias=bias,
                    dtype=self.dtype, name="policy_conv")(x)
        if self.use_batch_norm:
            p = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name="policy_bn")(p)
        p = nn.relu(p)
        p = p.reshape(p.shape[0], -1)
        n_actions = self.board_size * self.board_size + 1
        logits = nn.Dense(n_actions, dtype=jnp.float32, name="policy_fc")(
            p.astype(jnp.float32))

        # Value head (network.py:111-115)
        v = nn.Conv(self.value_head_channels, (1, 1), use_bias=bias,
                    dtype=self.dtype, name="value_conv")(x)
        if self.use_batch_norm:
            v = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name="value_bn")(v)
        v = nn.relu(v)
        v = v.reshape(v.shape[0], -1).astype(jnp.float32)
        v = nn.relu(nn.Dense(self.value_head_hidden_size, dtype=jnp.float32,
                             name="value_fc1")(v))
        v = jnp.tanh(nn.Dense(1, dtype=jnp.float32, name="value_fc2")(v))
        return logits, v.squeeze(-1)


def build_network(cfg: ModelConfig) -> AlphaZeroNet:
    return AlphaZeroNet(
        num_res_blocks=cfg.num_res_blocks,
        num_filters=cfg.num_filters,
        value_head_hidden_size=cfg.value_head_hidden_size,
        policy_head_channels=cfg.policy_head_channels,
        value_head_channels=cfg.value_head_channels,
        dropout=cfg.dropout,
        board_size=cfg.board_size,
        dtype=_dtype(cfg.compute_dtype),
        use_batch_norm=cfg.use_batch_norm,
    )


def init_variables(net: AlphaZeroNet, rng: jax.Array,
                   batch_size: int = 1) -> Dict[str, Any]:
    """Initialize {'params', 'batch_stats'} for the net (``batch_stats``
    is an empty dict for BN-free nets, keeping one pytree structure)."""
    dummy = jnp.zeros((batch_size, net.board_size, net.board_size, 3),
                      jnp.float32)
    variables = dict(net.init({"params": rng}, dummy, train=False))
    variables.setdefault("batch_stats", {})
    return variables


def apply_eval(net: AlphaZeroNet, variables: Dict[str, Any], planes: jax.Array
               ) -> Tuple[jax.Array, jax.Array]:
    """Inference forward pass: planes [B,8,8,3] -> (logits [B,65], value [B]).

    Analog of ``AlphaZeroNetwork.predict`` (network.py:137-158); BN uses
    running averages.
    """
    return net.apply(variables, planes, train=False)


def apply_train(net: AlphaZeroNet, variables: Dict[str, Any], planes: jax.Array,
                dropout_rng: Optional[jax.Array] = None
                ) -> Tuple[Tuple[jax.Array, jax.Array], Dict[str, Any]]:
    """Training forward pass; returns ((logits, value), new_model_state)."""
    rngs = {"dropout": dropout_rng} if dropout_rng is not None else {}
    (logits, value), mutated = net.apply(
        variables, planes, train=True, mutable=["batch_stats"], rngs=rngs)
    return (logits, value), dict(mutated) if mutated else {"batch_stats": {}}


def masked_policy(logits: jax.Array, legal_mask: jax.Array) -> jax.Array:
    """Softmax over legal actions only; illegal actions get probability 0.

    The reference masks by multiplying probabilities and renormalizing
    (src/mcts/mcts.py:604-615); masking logits before the softmax is the
    numerically sound equivalent.
    """
    neg = jnp.finfo(logits.dtype).min
    masked = jnp.where(legal_mask, logits, neg)
    # guard all-illegal rows (terminal states): fall back to uniform
    any_legal = legal_mask.any(axis=-1, keepdims=True)
    probs = jax.nn.softmax(masked, axis=-1)
    uniform = jnp.ones_like(probs) / probs.shape[-1]
    return jnp.where(any_legal, probs, uniform)


def tabulate_network(net: AlphaZeroNet, batch_size: int = 1) -> str:
    """Human-readable module table (layers, shapes, param counts) — the JAX
    analog of TensorBoard's traced model graph
    (/root/reference/src/logger.py:127-130 ``add_graph``)."""
    dummy = jnp.zeros((batch_size, net.board_size, net.board_size, 3),
                      jnp.float32)
    return nn.tabulate(
        net, jax.random.PRNGKey(0),
        console_kwargs={"width": 120, "force_terminal": False},
    )(dummy, train=False)
