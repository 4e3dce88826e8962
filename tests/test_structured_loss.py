"""Structured (factorized) negatives loss: parity with the tiled batch."""
import dataclasses

import jax
import numpy as np
import pytest

from relationprediction_tpu import config as config_lib
from relationprediction_tpu.models import build_model
from relationprediction_tpu.training import TrainLoop

V, R = 30, 5


def model_for(decoder_name, ds):
    cfg = config_lib.load("/root/reference/settings/distmult.exp")
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, code_dimension=16),
        decoder=dataclasses.replace(cfg.decoder, name=decoder_name,
                                    code_dimension=16))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    return build_model(cfg), cfg


@pytest.mark.parametrize("decoder_name", ["bilinear-diag", "complex"])
def test_structured_matches_tiled(toy_dataset, rng, decoder_name):
    ds = toy_dataset
    model, cfg = model_for(decoder_name, ds)
    params = model.init_params(jax.random.PRNGKey(0))

    n, k_s, k_o = len(ds.train), 5, 5
    positives = np.asarray(ds.train, dtype=np.int32)
    pos_mask = np.ones(n, np.float32)
    neg_s = rng.integers(0, ds.n_entities, (n, k_s)).astype(np.int32)
    neg_o = rng.integers(0, ds.n_entities, (n, k_o)).astype(np.int32)

    got = float(model.loss_structured(params, None, positives, pos_mask,
                                      neg_s, neg_o, deterministic=True,
                                      rng=jax.random.PRNGKey(1)))

    # Equivalent tiled batch: positives, then subject corruptions
    # (column-major per slot), then object corruptions.
    rows = [positives]
    for j in range(k_s):
        t = positives.copy()
        t[:, 0] = neg_s[:, j]
        rows.append(t)
    for j in range(k_o):
        t = positives.copy()
        t[:, 2] = neg_o[:, j]
        rows.append(t)
    tiled = np.concatenate(rows)
    labels = np.zeros(len(tiled), np.float32)
    labels[:n] = 1.0
    want = float(model.loss(params, None, tiled, labels,
                            deterministic=True, rng=jax.random.PRNGKey(1)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_structured_rejects_mlp_decoder(toy_dataset, rng):
    ds = toy_dataset
    model, _ = model_for("nonlinear-transform", ds)
    params = model.init_params(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        model.loss_structured(params, None, np.asarray(ds.train),
                              np.ones(len(ds.train), np.float32),
                              rng.integers(0, V, (len(ds.train), 2)),
                              rng.integers(0, V, (len(ds.train), 2)))


def test_split_mode_trains(toy_dataset):
    ds = toy_dataset
    model, cfg = model_for("bilinear-diag", ds)
    loop = TrainLoop(model, cfg, ds, seed=0, log=lambda s: None,
                     prefetch=False, negative_mode="split")
    assert loop._use_structured
    result = loop.fit(max_iterations=60)
    assert np.isfinite(result.last_loss)

    # gcn encoder + split mode
    cfg2 = config_lib.load("/root/reference/settings/gcn_basis.exp")
    cfg2 = dataclasses.replace(
        cfg2,
        encoder=dataclasses.replace(cfg2.encoder, code_dimension=16,
                                    internal_dimension=16, n_bases=4),
        decoder=dataclasses.replace(cfg2.decoder, code_dimension=16))
    cfg2 = cfg2.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    model2 = build_model(cfg2)
    loop2 = TrainLoop(model2, cfg2, ds, seed=0, log=lambda s: None,
                      prefetch=False, negative_mode="split")
    result2 = loop2.fit(max_iterations=25)
    assert np.isfinite(result2.last_loss)


def test_split_mode_falls_back_for_mlp(toy_dataset):
    ds = toy_dataset
    model, cfg = model_for("nonlinear-transform", ds)
    cfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, decoder_dimension=8,
                                         embedding_width=16))
    model = build_model(cfg)
    loop = TrainLoop(model, cfg, ds, seed=0, log=lambda s: None,
                     prefetch=False, negative_mode="split")
    assert not loop._use_structured  # silently uses the binomial path
    result = loop.fit(max_iterations=5)
    assert np.isfinite(result.last_loss)
