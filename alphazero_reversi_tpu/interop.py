"""Checkpoint interop with the reference's PyTorch models.

The reference trains ``AlphaZeroNetwork`` (torch, NCHW;
/root/reference/src/model/network.py:30-117) and persists either a raw
``state_dict`` (``best_model.pth``, src/trainer/pipeline.py:484-485) or a
wrapped ``{'model_state_dict': ...}`` checkpoint (:463-480), sometimes with
duplicated ``_script_module.``-prefixed keys from TorchScript
(:496-523). Our net (`models.resnet.AlphaZeroNet`) is architecturally
identical but NHWC/Flax, so a user migrating to this framework can carry
trained reference models across losslessly — and the mapping doubles as a
model-layer parity proof (tests/test_interop.py: same weights, same inputs
=> same logits/value across frameworks to float tolerance).

Layout mapping (torch -> flax):

* Conv ``weight [O, I, kh, kw]`` (OIHW) -> ``kernel [kh, kw, I, O]`` (HWIO).
* BatchNorm ``weight/bias`` -> params ``scale/bias``;
  ``running_mean/running_var`` -> batch_stats ``mean/var`` (same eps=1e-5).
* Linear ``weight [out, in]`` -> ``kernel [in, out]`` — with the *input
  permutation* induced by the flatten order: torch flattens NCHW activations
  (index ``c*H*W + h*W + w``), we flatten NHWC (``h*W*C + w*C + c``). The
  policy head flattens 2 channels, so its FC rows are permuted; the value
  head flattens 1 channel, where both orders coincide.

torch is imported lazily: the module stays importable (and the rest of the
framework torch-free) when torch is absent.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from .config import ModelConfig
from .models import resnet

# ---------------------------------------------------------------------------
# state-dict plumbing
# ---------------------------------------------------------------------------


def load_reference_state_dict(path: str) -> Dict[str, "np.ndarray"]:
    """Load a reference ``.pth`` into ``{key: np.ndarray}``.

    Handles all three shapes the reference writes: a raw ``state_dict``,
    a ``{'model_state_dict': ...}`` wrapper, and TorchScript-prefixed
    ``_script_module.*`` keys (kept only when the plain key is absent —
    ``best_model.pth`` files often carry both copies)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    out: Dict[str, np.ndarray] = {}
    deferred = {}
    for k, v in obj.items():
        if not hasattr(v, "detach"):
            continue
        arr = v.detach().cpu().numpy()
        if k.startswith("_script_module."):
            deferred[k[len("_script_module."):]] = arr
        else:
            out[k] = arr
    for k, v in deferred.items():
        out.setdefault(k, v)
    return out


def _conv_to_flax(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0)).astype(np.float32)


def _conv_to_torch(k: np.ndarray) -> np.ndarray:
    """HWIO -> OIHW."""
    return np.transpose(np.asarray(k), (3, 2, 0, 1)).astype(np.float32)


def _flatten_perm(channels: int, board: int) -> np.ndarray:
    """perm[j_flax] = j_torch for the head-FC input flatten orders."""
    j = np.arange(channels * board * board)
    h, rem = j // (board * channels), j % (board * channels)
    w, c = rem // channels, rem % channels
    return c * board * board + h * board + w


def _infer_config(sd: Dict[str, np.ndarray]) -> ModelConfig:
    """Recover the architecture from a reference state dict's shapes."""
    num_filters = sd["conv.weight"].shape[0]
    blocks = {int(k.split(".")[1]) for k in sd if k.startswith("res_blocks.")}
    value_channels = sd["value_conv.weight"].shape[0]
    board2 = sd["value_fc1.weight"].shape[1] // value_channels
    board = int(round(board2 ** 0.5))
    if board * board != board2:
        raise ValueError(
            f"cannot infer board size: value_fc1 in={board2 * value_channels}"
            f" with {value_channels} value channels")
    return ModelConfig(
        num_res_blocks=(max(blocks) + 1) if blocks else 0,
        num_filters=num_filters,
        value_head_hidden_size=sd["value_fc1.weight"].shape[0],
        policy_head_channels=sd["policy_conv.weight"].shape[0],
        value_head_channels=sd["value_conv.weight"].shape[0],
        board_size=board,
    )


def _bn_pair(sd, torch_name):
    params = {"scale": sd[f"{torch_name}.weight"].astype(np.float32),
              "bias": sd[f"{torch_name}.bias"].astype(np.float32)}
    stats = {"mean": sd[f"{torch_name}.running_mean"].astype(np.float32),
             "var": sd[f"{torch_name}.running_var"].astype(np.float32)}
    return params, stats


def import_torch_checkpoint(path_or_state: Any,
                            cfg: Optional[ModelConfig] = None
                            ) -> Tuple[Dict[str, Any], ModelConfig]:
    """Reference torch checkpoint -> our ``{'params', 'batch_stats'}``.

    ``path_or_state`` is a ``.pth`` path or an already-loaded
    ``{key: ndarray}`` dict. Returns ``(variables, model_config)`` where
    ``model_config`` is inferred from the weights (or taken from ``cfg``,
    which must agree). The result drops into every consumer of
    ``init_variables`` output: ``resnet.apply_eval``, ``mcts.MCTS``,
    ``checkpoint.save_best``, the arena and the pipeline."""
    sd = (load_reference_state_dict(path_or_state)
          if isinstance(path_or_state, str) else dict(path_or_state))
    inferred = _infer_config(sd)
    if cfg is not None:
        for f in ("num_res_blocks", "num_filters", "value_head_hidden_size",
                  "policy_head_channels", "value_head_channels",
                  "board_size"):
            if getattr(cfg, f) != getattr(inferred, f):
                raise ValueError(
                    f"checkpoint architecture mismatch on {f}: "
                    f"config={getattr(cfg, f)} checkpoint={getattr(inferred, f)}")
        inferred = cfg

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["stem_conv"] = {"kernel": _conv_to_flax(sd["conv.weight"])}
    params["stem_bn"], stats["stem_bn"] = _bn_pair(sd, "bn")
    for i in range(inferred.num_res_blocks):
        t = f"res_blocks.{i}"
        block_p: Dict[str, Any] = {}
        block_s: Dict[str, Any] = {}
        for j in (1, 2):
            block_p[f"conv{j}"] = {
                "kernel": _conv_to_flax(sd[f"{t}.conv{j}.weight"])}
            block_p[f"bn{j}"], block_s[f"bn{j}"] = _bn_pair(sd, f"{t}.bn{j}")
        params[f"res{i}"] = block_p
        stats[f"res{i}"] = block_s

    params["policy_conv"] = {"kernel": _conv_to_flax(sd["policy_conv.weight"])}
    params["policy_bn"], stats["policy_bn"] = _bn_pair(sd, "policy_bn")
    perm = _flatten_perm(inferred.policy_head_channels, inferred.board_size)
    params["policy_fc"] = {
        "kernel": sd["policy_fc.weight"].T[perm].astype(np.float32),
        "bias": sd["policy_fc.bias"].astype(np.float32),
    }

    params["value_conv"] = {"kernel": _conv_to_flax(sd["value_conv.weight"])}
    params["value_bn"], stats["value_bn"] = _bn_pair(sd, "value_bn")
    vperm = _flatten_perm(inferred.value_head_channels, inferred.board_size)
    params["value_fc1"] = {
        "kernel": sd["value_fc1.weight"].T[vperm].astype(np.float32),
        "bias": sd["value_fc1.bias"].astype(np.float32),
    }
    params["value_fc2"] = {
        "kernel": sd["value_fc2.weight"].T.astype(np.float32),
        "bias": sd["value_fc2.bias"].astype(np.float32),
    }

    import jax.numpy as jnp

    as_jax = lambda t: jnp.asarray(t)  # noqa: E731
    import jax

    variables = jax.tree_util.tree_map(
        as_jax, {"params": params, "batch_stats": stats})
    return variables, inferred


def export_torch_checkpoint(variables: Dict[str, Any], path: str,
                            cfg: ModelConfig) -> None:
    """Our ``{'params', 'batch_stats'}`` -> a reference-loadable raw
    ``state_dict`` ``.pth`` (the ``best_model.pth`` shape its tournament
    and pipeline loaders accept, src/trainer/pipeline.py:407-421)."""
    import torch

    p = variables["params"]
    s = variables["batch_stats"]
    np_ = lambda x: np.asarray(x, dtype=np.float32)  # noqa: E731
    sd: Dict[str, Any] = {}

    def put_bn(torch_name, bp, bs):
        sd[f"{torch_name}.weight"] = np_(bp["scale"])
        sd[f"{torch_name}.bias"] = np_(bp["bias"])
        sd[f"{torch_name}.running_mean"] = np_(bs["mean"])
        sd[f"{torch_name}.running_var"] = np_(bs["var"])
        sd[f"{torch_name}.num_batches_tracked"] = np.zeros((), np.int64)

    sd["conv.weight"] = _conv_to_torch(p["stem_conv"]["kernel"])
    put_bn("bn", p["stem_bn"], s["stem_bn"])
    for i in range(cfg.num_res_blocks):
        for j in (1, 2):
            sd[f"res_blocks.{i}.conv{j}.weight"] = _conv_to_torch(
                p[f"res{i}"][f"conv{j}"]["kernel"])
            put_bn(f"res_blocks.{i}.bn{j}", p[f"res{i}"][f"bn{j}"],
                   s[f"res{i}"][f"bn{j}"])

    sd["policy_conv.weight"] = _conv_to_torch(p["policy_conv"]["kernel"])
    put_bn("policy_bn", p["policy_bn"], s["policy_bn"])
    perm = _flatten_perm(cfg.policy_head_channels, cfg.board_size)
    inv = np.argsort(perm)
    sd["policy_fc.weight"] = np_(p["policy_fc"]["kernel"])[inv].T
    sd["policy_fc.bias"] = np_(p["policy_fc"]["bias"])

    sd["value_conv.weight"] = _conv_to_torch(p["value_conv"]["kernel"])
    put_bn("value_bn", p["value_bn"], s["value_bn"])
    vinv = np.argsort(_flatten_perm(cfg.value_head_channels, cfg.board_size))
    sd["value_fc1.weight"] = np_(p["value_fc1"]["kernel"])[vinv].T
    sd["value_fc1.bias"] = np_(p["value_fc1"]["bias"])
    sd["value_fc2.weight"] = np_(p["value_fc2"]["kernel"]).T
    sd["value_fc2.bias"] = np_(p["value_fc2"]["bias"])

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v).copy())
                if isinstance(v, np.ndarray) else v
                for k, v in sd.items()}, path)


def import_to_orbax(pth_path: str, ckpt_dir: str,
                    cfg: Optional[ModelConfig] = None) -> ModelConfig:
    """One-shot migration: reference ``.pth`` -> our ``best`` Orbax
    checkpoint under ``ckpt_dir`` (what ``tournament``/``train --resume``
    discover)."""
    from . import checkpoint as ckpt_lib

    variables, inferred = import_torch_checkpoint(pth_path, cfg)
    ckpt_lib.save_best(ckpt_dir, variables)
    return inferred
