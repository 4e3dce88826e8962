#!/usr/bin/env python
"""Quality dossier: early-stopped Toy runs of all four experiment configs.

Trains each settings/*.exp on the vendored Toy dataset (the only dataset
the environment ships a train split for) with validation-MRR early
stopping, over several seeds, and prints the docs/QUALITY.md table.
Runs on CPU (forced) so numbers are environment-independent; Toy is 16
entities / 9 relations / 43 train triples.

Usage: python benchmarks/quality_dossier.py [max_iters] [seeds...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def run_one(exp, seed, max_iters, check_every=100, burnin=200):
    import dataclasses

    from relationprediction_tpu import config as config_lib
    from relationprediction_tpu.data import dataset as dataset_lib
    from relationprediction_tpu.evaluation import Scorer
    from relationprediction_tpu.models import build_model
    from relationprediction_tpu.models.build import JittedModelView
    from relationprediction_tpu.training import TrainLoop

    ds = dataset_lib.load(os.path.join(os.path.dirname(__file__), "..",
                                       "data", "Toy"))
    cfg = config_lib.load(os.path.join(os.path.dirname(__file__), "..",
                                       "settings", f"{exp}.exp"))
    # Toy-scale early-stopping cadence (the shipped configs check every
    # 2000 with 6000 burn-in — tuned for FB15k-scale runs).
    cfg = dataclasses.replace(
        cfg, optimizer=dataclasses.replace(
            cfg.optimizer, early_stopping_check_every=check_every,
            early_stopping_burnin=burnin))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    model = build_model(cfg)
    view = JittedModelView(model)

    eval_graph = None
    if model.needs_graph():
        eval_graph = model.make_graph(ds.train, pad_to=64)

    scorer = Scorer(metric="MRR")
    for t in (ds.train, ds.valid, ds.test):
        scorer.register_data(t)
    scorer.register_degrees(ds.train)
    scorer.register_model(view, None, eval_graph, n_entities=ds.n_entities)
    scorer.finalize_frequency_computation(ds.all_triples())

    def score_validation(params):
        scorer.set_params(params)
        return scorer.compute_scores(ds.valid).results["Filtered"]["MRR"]

    loop = TrainLoop(model, cfg, ds, scoring_function=score_validation,
                     seed=seed, log=lambda s: None, prefetch=False)
    t0 = time.time()
    result = loop.fit(max_iterations=max_iters)
    wall = time.time() - t0

    scorer.set_params(result.params)
    summary = scorer.compute_scores(ds.test)
    f = summary.results["Filtered"]
    r = summary.results["Raw"]
    return dict(exp=exp, seed=seed, iters=result.iterations,
                stopped=result.stopped_early, wall=wall,
                mrr=f["MRR"], h1=f["H@1"], h3=f["H@3"], h10=f["H@10"],
                raw_mrr=r["MRR"])


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    max_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    seeds = [int(s) for s in sys.argv[2:]] or [0, 1, 2]

    rows = []
    for exp in ("gcn_basis", "gcn_block", "distmult", "complex"):
        for seed in seeds:
            r = run_one(exp, seed, max_iters)
            rows.append(r)
            print(f"{exp:10s} seed {seed}: filtered MRR {r['mrr']:.3f} "
                  f"H@1 {r['h1']:.2f} H@3 {r['h3']:.2f} H@10 {r['h10']:.2f}"
                  f"  ({r['iters']} iters, stop={r['stopped']}, "
                  f"{r['wall']:.0f}s)", flush=True)

    print("\n| config | seeds | filtered MRR (min-max) | H@1 | H@3 | H@10 "
          "| iters |")
    print("|---|---|---|---|---|---|---|")
    for exp in ("gcn_basis", "gcn_block", "distmult", "complex"):
        rs = [r for r in rows if r["exp"] == exp]
        mrr = [r["mrr"] for r in rs]
        print(f"| {exp} | {len(rs)} | {min(mrr):.3f}-{max(mrr):.3f} "
              f"| {np.mean([r['h1'] for r in rs]):.2f} "
              f"| {np.mean([r['h3'] for r in rs]):.2f} "
              f"| {np.mean([r['h10'] for r in rs]):.2f} "
              f"| {'/'.join(str(r['iters']) for r in rs)} |")


if __name__ == "__main__":
    main()
