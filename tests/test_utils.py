import jax.numpy as jnp
import numpy as np

from pclean_tpu.utils import (NEG_INF, effective_sample_size, log_normalize,
                              logsumexp)


def test_logsumexp_matches_numpy():
    x = jnp.array([0.1, -2.0, 3.0])
    ref = np.log(np.exp(np.array(x)).sum())
    assert np.allclose(float(logsumexp(x)), ref, atol=1e-6)


def test_logsumexp_masked():
    x = jnp.array([0.0, 100.0, 1.0])
    m = jnp.array([True, False, True])
    ref = np.log(np.exp(0.0) + np.exp(1.0))
    assert np.allclose(float(logsumexp(x, where=m)), ref, atol=1e-6)


def test_logsumexp_all_masked_is_neg_inf():
    x = jnp.array([1.0, 2.0])
    m = jnp.array([False, False])
    assert float(logsumexp(x, where=m)) <= NEG_INF / 2


def test_log_normalize():
    x = jnp.array([1.0, 2.0, 3.0])
    ln = log_normalize(x)
    assert np.allclose(float(jnp.exp(ln).sum()), 1.0, atol=1e-4)  # float32


def test_ess_uniform_weights():
    lw = log_normalize(jnp.zeros(8))
    assert np.allclose(float(effective_sample_size(lw)), 8.0, atol=1e-4)
