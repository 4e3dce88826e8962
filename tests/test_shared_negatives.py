"""Shared-negative-pool loss: equivalence with a materialized pool batch."""
import dataclasses

import jax
import numpy as np
import pytest

from relationprediction_tpu import config as config_lib
from relationprediction_tpu.models import build_model
from relationprediction_tpu.training import TrainLoop


def model_for(decoder_name, ds, dim=16):
    cfg = config_lib.load("/root/reference/settings/distmult.exp")
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, code_dimension=dim),
        decoder=dataclasses.replace(cfg.decoder, name=decoder_name,
                                    code_dimension=dim))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    return build_model(cfg), cfg


@pytest.mark.parametrize("decoder_name", ["bilinear-diag", "complex"])
def test_shared_matches_materialized(toy_dataset, rng, decoder_name):
    ds = toy_dataset
    model, cfg = model_for(decoder_name, ds)
    params = model.init_params(jax.random.PRNGKey(0))

    n = len(ds.train)
    positives = np.asarray(ds.train, dtype=np.int32)
    pos_mask = np.ones(n, np.float32)
    pool = rng.integers(0, ds.n_entities, 7).astype(np.int32)

    got = float(model.loss_shared_negatives(
        params, None, positives, pos_mask, pool, deterministic=True,
        rng=jax.random.PRNGKey(1)))

    # Materialize the equivalent batch: positives + every (positive, pool
    # entity) subject corruption + every object corruption.
    rows = [positives]
    for v in pool:
        t = positives.copy()
        t[:, 0] = v
        rows.append(t)
    for v in pool:
        t = positives.copy()
        t[:, 2] = v
        rows.append(t)
    tiled = np.concatenate(rows)
    labels = np.zeros(len(tiled), np.float32)
    labels[:n] = 1.0
    want = float(model.loss(params, None, tiled, labels, deterministic=True,
                            rng=jax.random.PRNGKey(1)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_shared_mode_trains_and_learns(toy_dataset):
    ds = toy_dataset
    model, cfg = model_for("bilinear-diag", ds)
    loop = TrainLoop(model, cfg, ds, seed=0, log=lambda s: None,
                     prefetch=False, negative_mode="shared",
                     negative_pool_size=8)
    assert loop._use_shared
    result = loop.fit(max_iterations=120)
    assert np.isfinite(result.last_loss)
    assert result.last_loss < 0.7  # learned something
