import jax
import numpy as np
import pytest

from relationprediction_tpu.models import decoders as dec
from tests.oracles import numpy_rgcn as oracle

N, V, D = 7, 11, 8


@pytest.fixture
def codes(rng):
    e1 = rng.standard_normal((N, D)).astype(np.float32)
    r = rng.standard_normal((N, D)).astype(np.float32)
    e2 = rng.standard_normal((N, D)).astype(np.float32)
    allc = rng.standard_normal((V, D)).astype(np.float32)
    return e1, r, e2, allc


def test_distmult_energies(codes):
    e1, r, e2, _ = codes
    d = dec.build_decoder("bilinear-diag", code_dimension=D,
                          regularization_parameter=0.01)
    got = np.asarray(d.energies({}, e1, r, e2))
    np.testing.assert_allclose(got, oracle.distmult_energy(e1, r, e2),
                               rtol=1e-5)


def test_distmult_all_entity_consistency(codes):
    """Row n, column v of the all-entity scores == pointwise energy with
    entity v substituted."""
    e1, r, e2, allc = codes
    d = dec.build_decoder("bilinear-diag", code_dimension=D,
                          regularization_parameter=0.01)
    subj = np.asarray(d.all_subject_energies({}, allc, r, e2))
    obj = np.asarray(d.all_object_energies({}, allc, e1, r))
    assert subj.shape == (N, V) and obj.shape == (N, V)
    for n in (0, 3):
        for v in (0, 5):
            np.testing.assert_allclose(
                subj[n, v], oracle.distmult_energy(allc[v], r[n], e2[n]),
                rtol=1e-4)
            np.testing.assert_allclose(
                obj[n, v], oracle.distmult_energy(e1[n], r[n], allc[v]),
                rtol=1e-4)


def test_complex_energies(codes):
    e1, r, e2, allc = codes
    d = dec.build_decoder("complex", code_dimension=D,
                          regularization_parameter=0.01)
    got = np.asarray(d.energies({}, e1, r, e2))
    np.testing.assert_allclose(got, oracle.complex_energy(e1, r, e2),
                               rtol=1e-4, atol=1e-5)

    subj = np.asarray(d.all_subject_energies({}, allc, r, e2))
    obj = np.asarray(d.all_object_energies({}, allc, e1, r))
    for n in (1, 4):
        for v in (2, 7):
            np.testing.assert_allclose(
                subj[n, v], oracle.complex_energy(allc[v], r[n], e2[n]),
                rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(
                obj[n, v], oracle.complex_energy(e1[n], r[n], allc[v]),
                rtol=1e-4, atol=1e-5)


def test_weighted_ce_loss_matches_oracle(rng):
    energies = rng.standard_normal(20).astype(np.float32)
    labels = (rng.random(20) < 0.5).astype(np.float32)
    got = float(dec.weighted_ce_loss(energies, labels))
    np.testing.assert_allclose(got, oracle.sigmoid_ce(energies, labels),
                               rtol=1e-5)


def test_weighted_ce_loss_mask(rng):
    energies = rng.standard_normal(20).astype(np.float32)
    labels = (rng.random(20) < 0.5).astype(np.float32)
    mask = np.ones(20, dtype=np.float32)
    mask[15:] = 0.0
    got = float(dec.weighted_ce_loss(energies, labels, mask))
    want = oracle.sigmoid_ce(energies[:15], labels[:15])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_regularization(codes):
    e1, r, e2, _ = codes
    d = dec.build_decoder("bilinear-diag", code_dimension=D,
                          regularization_parameter=0.01)
    got = float(d.regularization({}, e1, r, e2))
    want = 0.01 * (np.mean(e1**2) + np.mean(r**2) + np.mean(e2**2))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_nonlinear_transform_decoder(codes):
    e1, r, e2, allc = codes
    d = dec.build_decoder("nonlinear-transform", code_dimension=D,
                          regularization_parameter=0.01,
                          decoder_dimension=6, embedding_width=D)
    params = d.init(jax.random.PRNGKey(0))
    en = np.asarray(d.energies(params, e1, r, e2))
    assert en.shape == (N,)

    # all-entity scoring consistency (our corrected implementation)
    subj = np.asarray(d.all_subject_energies(params, allc, r, e2))
    assert subj.shape == (N, V)
    for n in (0, 2):
        for v in (1, 6):
            np.testing.assert_allclose(
                subj[n, v],
                float(np.asarray(d.energies(params, allc[v:v + 1],
                                            r[n:n + 1], e2[n:n + 1]))[0]),
                rtol=1e-4, atol=1e-5)
