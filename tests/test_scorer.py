"""Scorer integration tests: metric exactness against brute-force numpy."""
import dataclasses

import jax
import numpy as np

from relationprediction_tpu import config as config_lib
from relationprediction_tpu.evaluation import Scorer
from relationprediction_tpu.models import build_model
from tests.oracles import numpy_rgcn as oracle


def build_distmult(ds, dim=8):
    cfg = config_lib.load("/root/reference/settings/distmult.exp")
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, code_dimension=dim),
        decoder=dataclasses.replace(cfg.decoder, code_dimension=dim))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(3))
    return model, params


def make_scorer(ds, model, params):
    scorer = Scorer(metric="MRR", chunk_size=3)
    scorer.register_data(ds.train)
    scorer.register_data(ds.valid)
    scorer.register_data(ds.test)
    scorer.register_degrees(ds.train)
    scorer.register_model(model, params, None, n_entities=ds.n_entities)
    scorer.finalize_frequency_computation(ds.all_triples())
    return scorer


def test_mrr_summary_matches_bruteforce(toy_dataset):
    ds = toy_dataset
    model, params = build_distmult(ds)
    scorer = make_scorer(ds, model, params)
    summary = scorer.compute_scores(ds.test)

    # Brute force with numpy from the raw codes.
    E = np.asarray(params["embedding"]["W"])
    R = np.asarray(params["relation_embedding"]["W_relation"])
    raw_ranks, filt_ranks = [], []
    for s, r, o in ds.test:
        scores = np.array([oracle.distmult_energy(E[v], R[r], E[o])
                           for v in range(ds.n_entities)])
        kn = scorer.known_subjects[(int(o), int(r))]
        rr, fr = oracle.ranks(scores, int(s), kn)
        raw_ranks.append(rr), filt_ranks.append(fr)
    for s, r, o in ds.test:
        scores = np.array([oracle.distmult_energy(E[s], R[r], E[v])
                           for v in range(ds.n_entities)])
        kn = scorer.known_objects[(int(s), int(r))]
        rr, fr = oracle.ranks(scores, int(o), kn)
        raw_ranks.append(rr), filt_ranks.append(fr)

    want_mrr_raw = np.mean(1.0 / np.asarray(raw_ranks))
    want_mrr_filt = np.mean(1.0 / np.asarray(filt_ranks))
    np.testing.assert_allclose(summary.results["Raw"]["MRR"], want_mrr_raw,
                               rtol=1e-5)
    np.testing.assert_allclose(summary.results["Filtered"]["MRR"],
                               want_mrr_filt, rtol=1e-5)
    for h in (1, 3, 10):
        np.testing.assert_allclose(
            summary.results["Raw"][f"H@{h}"],
            np.mean(np.asarray(raw_ranks) <= h), rtol=1e-6)


def test_degree_frequency_breakdowns(toy_dataset, tmp_path):
    ds = toy_dataset
    model, params = build_distmult(ds)
    scorer = make_scorer(ds, model, params)
    summary = scorer.compute_scores(ds.test)
    n = len(ds.test)
    assert len(summary.in_degrees) == 2 * n
    assert len(summary.vertex_freqs) == 2 * n
    summary.dump_degrees(str(tmp_path / "in"), str(tmp_path / "out"))
    summary.dump_frequencies(str(tmp_path / "vf"), str(tmp_path / "rf"))
    assert len(open(tmp_path / "in").readlines()) == 2 * n


def test_accuracy_metric(toy_dataset):
    ds = toy_dataset
    model, params = build_distmult(ds)
    scorer = Scorer(metric="Accuracy")
    scorer.register_model(model, params, None, n_entities=ds.n_entities)
    # Pairwise pos/neg file layout: even rows positive, odd rows negative.
    pairs = np.repeat(ds.test, 2, axis=0)
    pairs[1::2, 2] = (pairs[1::2, 2] + 1) % ds.n_entities
    summary = scorer.compute_scores(pairs)
    acc = summary.results["Filtered"]["Accuracy"]
    assert 0.0 <= acc <= 1.0


def test_dump_all_scores(toy_dataset, tmp_path):
    ds = toy_dataset
    model, params = build_distmult(ds)
    scorer = make_scorer(ds, model, params)
    sf, of = str(tmp_path / "subj"), str(tmp_path / "obj")
    scorer.dump_all_scores(ds.test, sf, of)
    lines = open(sf).readlines()
    assert len(lines) == len(ds.test)
    assert " | " in lines[0]
