"""End-to-end coverage of the remaining encoder/decoder config surface."""
import dataclasses

import jax
import numpy as np
import pytest

from relationprediction_tpu import config as config_lib
from relationprediction_tpu.models import build_model
from relationprediction_tpu.training import TrainLoop


def cfg_for(ds, **enc_overrides):
    cfg = config_lib.load("/root/reference/settings/gcn_basis.exp")
    enc = dataclasses.replace(cfg.encoder, code_dimension=16,
                              internal_dimension=16, n_bases=4,
                              **enc_overrides)
    dec = dataclasses.replace(cfg.decoder, code_dimension=16)
    cfg = dataclasses.replace(cfg, encoder=enc, decoder=dec)
    return cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))


def run_once(ds, cfg, iters=3):
    model = build_model(cfg)
    loop = TrainLoop(model, cfg, ds, seed=0, log=lambda s: None,
                     prefetch=False)
    result = loop.fit(max_iterations=iters)
    assert np.isfinite(result.last_loss)
    g = model.make_graph(ds.train, pad_to=64) if model.needs_graph() else None
    s = model.score_all_subjects(result.params, g, ds.test)
    assert np.isfinite(np.asarray(s)).all()
    return result


def test_gcn_diag_encoder(toy_dataset):
    cfg = cfg_for(toy_dataset, name="gcn_diag")
    run_once(toy_dataset, cfg)


def test_variational_embedding(toy_dataset):
    cfg = cfg_for(toy_dataset, name="variational_embedding")
    run_once(toy_dataset, cfg)


def test_variational_gcn_basis(toy_dataset):
    # NOTE: at Toy scale the reference's variational math is intrinsically
    # explosive at init (tiny entity count -> large glorot std -> huge
    # log_sigma -> exp overflow in the KL; the TF original behaves the
    # same). Test the path at a 1-layer configuration with a small lr.
    cfg = cfg_for(toy_dataset, name="variational_gcn_basis", n_layers=1)
    cfg = dataclasses.replace(
        cfg, optimizer=dataclasses.replace(cfg.optimizer,
                                           learning_rate=1e-4))
    run_once(toy_dataset, cfg)


def test_random_input(toy_dataset):
    cfg = cfg_for(toy_dataset, use_input_transform=False, random_input=True)
    run_once(toy_dataset, cfg)


def test_partially_random_input(toy_dataset):
    cfg = cfg_for(toy_dataset, use_input_transform=False,
                  partially_random_input=True)
    run_once(toy_dataset, cfg)


def test_onehot_first_layer_path(toy_dataset):
    cfg = cfg_for(toy_dataset, use_input_transform=False)
    model = build_model(cfg)
    assert model.first_layer_onehot
    run_once(toy_dataset, cfg)


def test_highway_skip_connections(toy_dataset):
    cfg = cfg_for(toy_dataset, skip_connections="Highway")
    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    assert "highways" in params
    run_once(toy_dataset, cfg)


def test_residual_skip_connections(toy_dataset):
    cfg = cfg_for(toy_dataset, skip_connections="Residual")
    run_once(toy_dataset, cfg)


def test_output_transform(toy_dataset):
    cfg = cfg_for(toy_dataset, use_output_transform=True)
    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    assert "output_transform" in params
    run_once(toy_dataset, cfg)


def test_basis_variants_train(toy_dataset):
    for flags in ({"add_diagonal": True}, {"diagonal_coefficients": True}):
        cfg = cfg_for(toy_dataset, **flags)
        run_once(toy_dataset, cfg)


def test_nonlinear_transform_decoder_e2e(toy_dataset):
    cfg = cfg_for(toy_dataset)
    cfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder,
                                         name="nonlinear-transform",
                                         decoder_dimension=8,
                                         embedding_width=16))
    run_once(toy_dataset, cfg)


@pytest.mark.parametrize("algo", ["GradientDescent", "AdaGrad", "RmsProp"])
def test_optimizer_algorithms(toy_dataset, algo):
    cfg = cfg_for(toy_dataset)
    cfg = dataclasses.replace(
        cfg, optimizer=dataclasses.replace(cfg.optimizer, algorithm=algo,
                                           learning_rate=0.001))
    run_once(toy_dataset, cfg)


def test_unknown_optimizer_raises(toy_dataset):
    from relationprediction_tpu.training.optimizers import build_optimizer
    cfg = cfg_for(toy_dataset)
    bad = dataclasses.replace(cfg.optimizer, algorithm="Bogus")
    with pytest.raises(ValueError):
        build_optimizer(bad)


def test_max_seconds_budget(toy_dataset):
    cfg = cfg_for(toy_dataset)
    model = build_model(cfg)
    loop = TrainLoop(model, cfg, toy_dataset, seed=0, log=lambda s: None,
                     prefetch=False)
    result = loop.fit(max_seconds=0.0)
    assert result.iterations == 0


def test_relation_filter(toy_dataset):
    from relationprediction_tpu.sampling import RelationFilter
    ds = toy_dataset
    rf = RelationFilter(n_keep=3)
    rels = {name: i for i, name in ds.relations.items()}
    rf.register(ds.train, rels)
    filtered = rf.filter(ds.train)
    assert filtered[:, 1].max() <= 2
    # top-2 most frequent keep distinct ids; the rest share id 2
    counts = np.bincount(np.asarray(ds.train)[:, 1],
                         minlength=ds.n_relations)
    top = np.argsort(counts)[::-1][:2]
    for rid in top:
        assert rf.mapping[int(rid)] < 2
