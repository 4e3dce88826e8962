"""Learning-quality canary: trained filtered MRR must beat chance by a wide
margin on a learnable synthetic KG (ground-truth DistMult generator)."""
import dataclasses

import numpy as np

from relationprediction_tpu import config as config_lib
from relationprediction_tpu.data import synthetic
from relationprediction_tpu.evaluation import Scorer
from relationprediction_tpu.models import build_model
from relationprediction_tpu.models.build import JittedModelView
from relationprediction_tpu.training import TrainLoop


def evaluate(model, params, ds, graph=None):
    view = JittedModelView(model)
    scorer = Scorer(metric="MRR")
    scorer.register_data(ds.train)
    scorer.register_data(ds.valid)
    scorer.register_data(ds.test)
    scorer.register_degrees(ds.train)
    scorer.register_model(view, params, graph, n_entities=ds.n_entities)
    scorer.finalize_frequency_computation(ds.all_triples())
    return scorer.compute_scores(ds.test).results["Filtered"]["MRR"]


def test_distmult_learns_synthetic():
    ds = synthetic.learnable(60, 6, 2500, 100, 100, latent_dim=4,
                             temperature=1.0, seed=0)
    cfg = config_lib.load("/root/reference/settings/distmult.exp")
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, code_dimension=16),
        decoder=dataclasses.replace(cfg.decoder, code_dimension=16),
        optimizer=dataclasses.replace(cfg.optimizer, batch_size=512))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    model = build_model(cfg)

    loop = TrainLoop(model, cfg, ds, seed=0, log=lambda s: None,
                     prefetch=False)
    params, opt_state = loop.init_state()
    mrr_before = evaluate(model, params, ds)
    result = loop.fit(params, opt_state, max_iterations=400)
    mrr_after = evaluate(model, result.params, ds)

    chance = 1.0 / ds.n_entities
    assert mrr_after > 5 * chance, (mrr_before, mrr_after)
    assert mrr_after > 2 * mrr_before, (mrr_before, mrr_after)


def test_rgcn_learns_synthetic():
    ds = synthetic.learnable(60, 6, 2500, 100, 100, latent_dim=4,
                             temperature=1.0, seed=1)
    cfg = config_lib.load("/root/reference/settings/gcn_basis.exp")
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, code_dimension=16,
                                    internal_dimension=16, n_bases=4),
        decoder=dataclasses.replace(cfg.decoder, code_dimension=16))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    model = build_model(cfg)

    loop = TrainLoop(model, cfg, ds, seed=0, log=lambda s: None,
                     prefetch=False)
    result = loop.fit(max_iterations=250)
    graph = model.make_graph(ds.train)
    mrr = evaluate(model, result.params, ds, graph)
    assert mrr > 5.0 / ds.n_entities, mrr
