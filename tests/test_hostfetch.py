"""Relay-hang watchdog tests (VERDICT r3 item 8): a critical host fetch
that hangs must fail fast with FetchTimeoutError instead of blocking the
training process forever (PERF.md r3 records a real indefinite device_get
hang at flagship iteration 300)."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_reversi_tpu import hostfetch


def test_guarded_passthrough_without_timeout():
    assert hostfetch.guarded(lambda: 42, None) == 42
    assert hostfetch.guarded(lambda: 42, 0) == 42


def test_device_get_returns_data_under_watchdog():
    x = jnp.arange(8.0)
    out = hostfetch.device_get({"x": x}, timeout_s=30.0)
    np.testing.assert_array_equal(out["x"], np.arange(8.0))
    assert hostfetch.last_fetch_seconds() >= 0.0


def test_guarded_raises_on_hang():
    t0 = time.perf_counter()
    with pytest.raises(hostfetch.FetchTimeoutError):
        hostfetch.guarded(lambda: time.sleep(30), timeout_s=0.2,
                          what="stub hang")
    # fail FAST: well under the stub's 30 s sleep
    assert time.perf_counter() - t0 < 5.0


def test_guarded_propagates_worker_exception():
    def boom():
        raise ValueError("inner")

    with pytest.raises(ValueError, match="inner"):
        hostfetch.guarded(boom, timeout_s=5.0)


def test_stubbed_hanging_device_get(monkeypatch):
    """The exact production failure mode: jax.device_get never returns."""
    monkeypatch.setattr(jax, "device_get", lambda tree: time.sleep(30))
    with pytest.raises(hostfetch.FetchTimeoutError):
        hostfetch.device_get(jnp.zeros(4), timeout_s=0.2)


def test_pipeline_checkpoint_fetch_is_guarded(tmp_path, monkeypatch):
    """TrainingConfig.fetch_timeout_s is consumed: a hanging device fetch
    during save_checkpoint aborts with FetchTimeoutError instead of
    wedging the pipeline."""
    from tests.test_pipeline import tiny_config
    from alphazero_reversi_tpu.pipeline import AlphaZeroPipeline

    cfg = tiny_config(tmp_path)
    cfg.training.fetch_timeout_s = 0.2
    pipe = AlphaZeroPipeline(cfg, run_name="wd")

    monkeypatch.setattr(jax, "device_get", lambda tree: time.sleep(30))
    with pytest.raises(hostfetch.FetchTimeoutError):
        pipe.save_checkpoint()
