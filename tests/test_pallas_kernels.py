"""Pallas kernel parity tests (interpreter mode — no TPU required)."""
import jax
import numpy as np
import pytest

from relationprediction_tpu.ops import pallas_gather as pg


def test_gather_rows_matches_xla(rng):
    V, D, E = 100, 24, 512
    table = rng.standard_normal((V, D)).astype(np.float32)
    idx = rng.integers(0, V, E).astype(np.int32)
    got = np.asarray(pg.gather_rows(table, idx, interpret=True))
    np.testing.assert_allclose(got, table[idx], rtol=1e-6)


def test_gather_rows_block_validation(rng):
    table = rng.standard_normal((10, 8)).astype(np.float32)
    idx = rng.integers(0, 10, 100).astype(np.int32)
    with pytest.raises(ValueError):
        pg.gather_rows(table, idx, block_size=512, interpret=True)


def test_sorted_segment_sum_matches_xla(rng):
    D, E, n_rows = 16, 300, 48
    targets = np.sort(rng.integers(0, n_rows, E)).astype(np.int32)
    perm = rng.permutation(E).astype(np.int32)
    msgs = rng.standard_normal((E, D)).astype(np.float32)
    row_ptr = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(np.bincount(targets, minlength=n_rows), out=row_ptr[1:])

    got = np.asarray(pg.sorted_segment_sum(msgs, perm, row_ptr,
                                           n_rows=n_rows, interpret=True))
    want = np.zeros((n_rows, D), dtype=np.float32)
    for j in range(E):
        want[targets[j]] += msgs[perm[j]]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sorted_segment_sum_empty_rows(rng):
    """Rows with no incident edges must come out exactly zero."""
    D, n_rows = 8, 16
    targets = np.array([3, 3, 3, 10], dtype=np.int32)  # rows 0-2,4-9,11+ empty
    E = len(targets)
    perm = np.arange(E, dtype=np.int32)
    msgs = rng.standard_normal((E, D)).astype(np.float32)
    row_ptr = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(np.bincount(targets, minlength=n_rows), out=row_ptr[1:])

    got = np.asarray(pg.sorted_segment_sum(msgs, perm, row_ptr,
                                           n_rows=n_rows, interpret=True))
    np.testing.assert_allclose(got[3], msgs[:3].sum(0), rtol=1e-5)
    np.testing.assert_allclose(got[10], msgs[3], rtol=1e-6)
    mask = np.ones(n_rows, bool)
    mask[[3, 10]] = False
    np.testing.assert_array_equal(got[mask], 0.0)
