"""Distribution tests for the collective-free gamma/Dirichlet sampler
(ops/random.py) against jax.random's rejection-sampling reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_reversi_tpu.ops import random as rand_ops


@pytest.mark.parametrize("alpha", [0.3, 0.5, 1.0, 2.5])
def test_log_gamma_moments(alpha):
    """Gamma(a) has mean a and variance a; the fixed-trial sampler must
    reproduce both within Monte-Carlo tolerance."""
    n = 200_000
    g = np.exp(np.asarray(rand_ops.sample_log_gamma(
        jax.random.PRNGKey(0), alpha, (n,))))
    # MC standard error of the mean: sqrt(var/n) = sqrt(a/n)
    se_mean = np.sqrt(alpha / n)
    assert abs(g.mean() - alpha) < 5 * se_mean
    # variance: looser (4th-moment noise), 5% relative
    assert abs(g.var() - alpha) < 0.05 * alpha


def test_dirichlet_noise_matches_jax_dirichlet():
    """Marginal moments of the masked Dirichlet agree with
    jax.random.dirichlet at the AlphaZero operating point (alpha=0.3 over
    10 legal actions)."""
    n, k, alpha = 100_000, 10, 0.3
    legal = jnp.zeros((n, 16), bool).at[:, :k].set(True)
    ours = np.asarray(rand_ops.dirichlet_noise(jax.random.PRNGKey(1),
                                               alpha, legal))
    assert ours.shape == (n, 16)
    np.testing.assert_allclose(ours.sum(-1), 1.0, atol=1e-5)
    assert (ours[:, k:] == 0).all()
    ref = np.asarray(jax.random.dirichlet(jax.random.PRNGKey(2),
                                          jnp.full((k,), alpha), (n,)))
    # per-component mean 1/k and the (shared) marginal std
    np.testing.assert_allclose(ours[:, :k].mean(0), 1.0 / k, atol=0.003)
    np.testing.assert_allclose(ours[:, :k].std(0).mean(),
                               ref.std(0).mean(), rtol=0.03)


def test_dirichlet_noise_tiny_alpha_is_finite_and_normalized():
    """alpha=0.03 (the AlphaZero default here) underflows naive
    gamma-then-normalize in float32; the log-space softmax must stay
    finite, normalized, and near-one-hot."""
    legal = jnp.ones((4096, 65), bool)
    ours = np.asarray(rand_ops.dirichlet_noise(jax.random.PRNGKey(3),
                                               0.03, legal))
    assert np.isfinite(ours).all()
    np.testing.assert_allclose(ours.sum(-1), 1.0, atol=1e-5)
    # sparsity profile matches jax's rejection sampler (median max
    # component ~0.46 at alpha=0.03 over 65 actions)
    ref = np.asarray(jax.random.dirichlet(jax.random.PRNGKey(5),
                                          jnp.full((65,), 0.03), (4096,)))
    np.testing.assert_allclose(np.median(ours.max(-1)),
                               np.median(ref.max(-1)), atol=0.05)


def test_dirichlet_noise_all_illegal_rows_are_zero():
    legal = jnp.zeros((8, 65), bool).at[:4, :5].set(True)
    ours = np.asarray(rand_ops.dirichlet_noise(jax.random.PRNGKey(4),
                                               0.3, legal))
    assert np.isfinite(ours).all()
    assert (ours[4:] == 0).all()
    np.testing.assert_allclose(ours[:4].sum(-1), 1.0, atol=1e-5)
