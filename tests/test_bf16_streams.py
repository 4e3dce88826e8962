"""bf16 decoder-stream / encoder-message precision modes.

The perf extensions (EncoderConfig.message_precision,
DecoderConfig.stream_precision — docs/ROOFLINE.md §4) must preserve the
objective: bf16 losses track f32 to bf16 tolerance, gradients stay
finite, and training still learns.
"""
import dataclasses

import jax
import numpy as np
import pytest

from relationprediction_tpu import config as config_lib
from relationprediction_tpu.models import build_model
from relationprediction_tpu.sampling import NegativeSampler
from relationprediction_tpu.training import TrainLoop


def _cfg(toy_dataset, exp="gcn_block", bf16=False):
    ds = toy_dataset
    cfg = config_lib.load(f"/root/reference/settings/{exp}.exp")
    enc_kw = dict(code_dimension=16, internal_dimension=16, n_bases=4)
    if exp == "gcn_block":
        enc_kw["concatenation"] = True
    if bf16:
        enc_kw["message_precision"] = "bfloat16"
    dec_kw = dict(code_dimension=16)
    if bf16:
        dec_kw["stream_precision"] = "bfloat16"
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, **enc_kw),
        decoder=dataclasses.replace(cfg.decoder, **dec_kw))
    return cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))


@pytest.mark.parametrize("exp", ["gcn_basis", "gcn_block", "distmult"])
def test_bf16_loss_tracks_f32(toy_dataset, exp):
    ds = toy_dataset
    ns = NegativeSampler(5, ds.n_entities, np.random.default_rng(0))
    x, y = ns.transform(ds.train)
    rng = jax.random.PRNGKey(3)

    losses = {}
    for bf16 in (False, True):
        cfg = _cfg(ds, exp, bf16=bf16)
        model = build_model(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        graph = model.make_graph(ds.train, pad_to=64) \
            if model.needs_graph() else None
        loss, grads = jax.value_and_grad(
            lambda p: model.loss(p, graph, x, y, rng=rng,
                                 deterministic=True))(params)
        assert np.isfinite(float(loss))
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.isfinite(np.asarray(leaf)).all()
        losses[bf16] = float(loss)
    # bf16 streams keep ~3 significant digits; the CE mean should agree
    # to well under a percent.
    assert losses[True] == pytest.approx(losses[False], rel=1e-2)


def test_bf16_streams_learn(toy_dataset):
    cfg = _cfg(toy_dataset, "gcn_basis", bf16=True)
    model = build_model(cfg)
    loop = TrainLoop(model, cfg, toy_dataset, seed=0, prefetch=False,
                     log=lambda m: None)
    first = loop.fit(max_iterations=1)
    more = loop.fit(params=first.params, opt_state=first.opt_state,
                    max_iterations=15, start_iteration=1)
    assert np.isfinite(more.last_loss)
    assert more.last_loss < first.last_loss
