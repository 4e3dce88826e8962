"""Medium-scale learning-quality regression gate for the flagship config.

A scaled-down version of the FB15k-237 capstone (benchmarks/
e2e_quality_run.py, results in docs/QUALITY.md): gcn_block-family model,
binomial (reference) negative protocol through the production TrainLoop,
on a learnable synthetic KG big enough (2,000 entities) that memorization
is impossible at these dimensions. The thresholds are LOOSE — the gate
exists to catch silent learning regressions (wrong normalization, broken
VJP, protocol drift), not to pin a paper number.
"""
import dataclasses

import jax
import numpy as np

from relationprediction_tpu import config as config_lib
from relationprediction_tpu.data import synthetic
from relationprediction_tpu.evaluation import Scorer
from relationprediction_tpu.models import build_model
from relationprediction_tpu.models.build import JittedModelView
from relationprediction_tpu.training import TrainLoop


def test_gcn_block_medium_scale_gate():
    ds = synthetic.learnable(2000, 40, 30000, 800, 800, latent_dim=8,
                             temperature=1.0, seed=0, name="gate-2k")
    cfg = config_lib.load("/root/reference/settings/gcn_block.exp")
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, code_dimension=64,
                                    internal_dimension=64, n_bases=16),
        decoder=dataclasses.replace(cfg.decoder, code_dimension=64))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    model = build_model(cfg)
    assert model.preferred_staircase2  # the gate covers the fused path

    loop = TrainLoop(model, cfg, ds, seed=0, log=lambda s: None,
                     negative_mode="binomial")
    assert loop._use_factored_binomial
    result = loop.fit(max_iterations=220)

    view = JittedModelView(model)
    eval_graph = model.make_graph(ds.train,
                                  pad_to=-(-len(ds.train) // 128) * 128)
    scorer = Scorer(metric="MRR")
    for t in (ds.train, ds.valid, ds.test):
        scorer.register_data(t)
    scorer.register_model(view, result.params, eval_graph,
                          n_entities=ds.n_entities)
    summary = scorer.compute_scores(ds.valid[:400])
    mrr = summary.results["Filtered"]["MRR"]
    h10 = summary.results["Filtered"]["H@10"]
    chance = 1.0 / ds.n_entities
    # Loose gates: far above chance, with a meaningful Hits@10. (At 220
    # iterations the model is still early in training — measured ~0.04
    # H@10 / ~0.03 MRR vs 0.0005 chance; thresholds sit well below the
    # measured values but far above any broken-learning outcome.)
    assert mrr > 40 * chance, (mrr, chance)
    assert h10 > 0.025, h10
