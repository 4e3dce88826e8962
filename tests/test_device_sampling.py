"""On-device negative sampling parity with the host sampler's semantics."""
import jax
import numpy as np

from relationprediction_tpu.training.device_sampling import (
    device_negative_sample)


def test_layout_and_semantics(rng):
    n, rate, V = 50, 10, 100
    pos = np.stack([rng.integers(0, V, n), rng.integers(0, 7, n),
                    rng.integers(0, V, n)], 1).astype(np.int32)
    mask = np.ones(n, np.float32)
    triples, labels, m = device_negative_sample(
        jax.numpy.asarray(pos), jax.numpy.asarray(mask), rate, V,
        jax.random.PRNGKey(0))
    triples, labels, m = map(np.asarray, (triples, labels, m))

    assert triples.shape == (n * (rate + 1), 3)
    np.testing.assert_array_equal(triples[:n], pos)
    np.testing.assert_array_equal(labels[:n], 1.0)
    np.testing.assert_array_equal(labels[n:], 0.0)
    np.testing.assert_array_equal(m, 1.0)

    src = np.tile(pos, (rate, 1))
    neg = triples[n:]
    np.testing.assert_array_equal(neg[:, 1], src[:, 1])  # relations intact
    subj_changed = neg[:, 0] != src[:, 0]
    obj_changed = neg[:, 2] != src[:, 2]
    assert not np.any(subj_changed & obj_changed)
    assert 0.4 < np.mean(obj_changed) < 0.6
    assert triples[n:].min() >= 0 and triples[n:].max() < V


def test_padding_masked(rng):
    n, rate, V = 8, 3, 20
    pos = np.zeros((n, 3), np.int32)
    pos[:5] = np.stack([rng.integers(0, V, 5), rng.integers(0, 4, 5),
                        rng.integers(0, V, 5)], 1)
    mask = np.zeros(n, np.float32)
    mask[:5] = 1.0
    triples, labels, m = device_negative_sample(
        jax.numpy.asarray(pos), jax.numpy.asarray(mask), rate, V,
        jax.random.PRNGKey(1))
    m = np.asarray(m)
    # every tiled copy repeats the positive mask
    np.testing.assert_array_equal(m.reshape(rate + 1, n),
                                  np.tile(mask, (rate + 1, 1)))
    # padded positives stay label-0
    np.testing.assert_array_equal(np.asarray(labels)[5:n], 0.0)
