"""Cross-framework checkpoint interop: same weights => same outputs.

Validates ``interop.import_torch_checkpoint`` / ``export_torch_checkpoint``
against the actual reference network (torch CPU,
/root/reference/src/model/network.py) — the model-layer parity proof: a
reference-trained checkpoint migrated to this framework produces the same
policy logits and value as torch does, to float tolerance, on the same
positions.
"""
import os
import sys

import numpy as np
import jax
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

from alphazero_reversi_tpu import interop  # noqa: E402
from alphazero_reversi_tpu.config import ModelConfig  # noqa: E402
from alphazero_reversi_tpu.env import bitboard as env  # noqa: E402
from alphazero_reversi_tpu.models import resnet  # noqa: E402

REF_BEST = ("/root/repo/refbench/workdir_train30/checkpoints/"
            "best_model.pth")


def _build_reference_net(num_res_blocks, num_filters):
    from src.model.network import AlphaZeroNetwork

    torch.manual_seed(0)
    net = AlphaZeroNetwork(board_size=8, num_res_blocks=num_res_blocks,
                           num_filters=num_filters)
    net.eval()
    # fill running stats with nontrivial values so BN eval paths are tested
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    return net


def _random_planes(batch, seed=0):
    rng = np.random.RandomState(seed)
    cur = (rng.rand(batch, 8, 8) > 0.6).astype(np.float32)
    opp = ((rng.rand(batch, 8, 8) > 0.6) * (1 - cur)).astype(np.float32)
    val = (rng.rand(batch, 8, 8) > 0.8).astype(np.float32)
    return np.stack([cur, opp, val], axis=1)  # NCHW


def _torch_forward(net, planes_nchw):
    with torch.no_grad():
        logits, value = net(torch.from_numpy(planes_nchw))
    return logits.numpy(), value.numpy()


def _ours_forward(variables, cfg, planes_nchw):
    net = resnet.build_network(cfg)
    planes = np.transpose(planes_nchw, (0, 2, 3, 1))  # NHWC
    logits, value = resnet.apply_eval(net, variables,
                                      np.asarray(planes, np.float32))
    return np.asarray(logits), np.asarray(value)


@pytest.mark.parametrize("blocks,filters", [(1, 8), (2, 16)])
def test_import_matches_torch_forward(blocks, filters):
    ref = _build_reference_net(blocks, filters)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables, cfg = interop.import_torch_checkpoint(sd)
    assert cfg.num_res_blocks == blocks and cfg.num_filters == filters
    cfg.compute_dtype = "float32"

    planes = _random_planes(16, seed=blocks)
    t_logits, t_value = _torch_forward(ref, planes)
    o_logits, o_value = _ours_forward(variables, cfg, planes)
    np.testing.assert_allclose(o_logits, t_logits, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(o_value, t_value, atol=2e-4, rtol=1e-4)


def test_export_roundtrip(tmp_path):
    cfg = ModelConfig(num_res_blocks=1, num_filters=8,
                      compute_dtype="float32")
    net = resnet.build_network(cfg)
    variables = resnet.init_variables(net, jax.random.PRNGKey(7))
    pth = str(tmp_path / "exported.pth")
    interop.export_torch_checkpoint(variables, pth, cfg)

    # the exported file must be loadable by the REFERENCE net...
    from src.model.network import AlphaZeroNetwork

    ref = AlphaZeroNetwork(board_size=8, num_res_blocks=1, num_filters=8)
    ref.load_state_dict(torch.load(pth, weights_only=False))
    ref.eval()

    # ...and produce our outputs
    planes = _random_planes(8, seed=3)
    t_logits, t_value = _torch_forward(ref, planes)
    o_logits, o_value = _ours_forward(variables, cfg, planes)
    np.testing.assert_allclose(o_logits, t_logits, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(o_value, t_value, atol=2e-4, rtol=1e-4)

    # and re-importing it is exact vs the original variables
    reimported, _ = interop.import_torch_checkpoint(pth)
    orig = jax.tree_util.tree_leaves(variables)
    back = jax.tree_util.tree_leaves(reimported)
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


@pytest.mark.skipif(not os.path.exists(REF_BEST),
                    reason="no reference-trained checkpoint on this machine")
def test_import_real_reference_checkpoint():
    """Import an actually-trained reference model (the 30-iteration parity
    run) and check forward parity on REAL positions from the initial
    board."""
    variables, cfg = interop.import_torch_checkpoint(REF_BEST)
    assert cfg.num_res_blocks == 5 and cfg.num_filters == 128
    cfg.compute_dtype = "float32"

    from src.model.network import AlphaZeroNetwork

    ref = AlphaZeroNetwork(board_size=8, num_res_blocks=5, num_filters=128)
    ref.load_state_dict(interop_state := {
        k: torch.from_numpy(v)
        for k, v in interop.load_reference_state_dict(REF_BEST).items()})
    del interop_state
    ref.eval()

    states = env.initial_state((4,))
    planes_nhwc = np.asarray(env.canonical_planes(states, compat=True),
                             np.float32)
    planes = np.transpose(planes_nhwc, (0, 3, 1, 2))
    t_logits, t_value = _torch_forward(ref, planes)
    o_logits, o_value = _ours_forward(variables, cfg, planes)
    np.testing.assert_allclose(o_logits, t_logits, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(o_value, t_value, atol=5e-4, rtol=1e-3)


def test_import_to_orbax_roundtrip(tmp_path):
    cfg = ModelConfig(num_res_blocks=1, num_filters=8,
                      compute_dtype="float32")
    ref = _build_reference_net(1, 8)
    pth = str(tmp_path / "ref.pth")
    torch.save(ref.state_dict(), pth)

    ckpt_dir = str(tmp_path / "ckpts")
    inferred = interop.import_to_orbax(pth, ckpt_dir)
    assert inferred.num_res_blocks == 1

    from alphazero_reversi_tpu import checkpoint as ckpt_lib

    net = resnet.build_network(cfg)
    template = resnet.init_variables(net, jax.random.PRNGKey(0))
    restored = ckpt_lib.restore_best(ckpt_dir, template)
    assert restored is not None
    direct, _ = interop.import_torch_checkpoint(pth)
    for a, b in zip(jax.tree_util.tree_leaves(direct),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))
