#!/usr/bin/env python
"""Standalone evaluation CLI: score a trained checkpoint on any split.

The reference could only evaluate inside a training run (its score dumps
were commented-out lines in ``code/train.py:112-114,283-284``); this
driver closes the loop for the R-GCN+ ensemble workflow
(``code/tools/ensemble.py``) and for offline analysis:

    rgcn-eval --settings settings/gcn_block.exp --dataset data/Toy \
        --split test                              # metrics table
    rgcn-eval ... --dump-scores dumps/rgcn        # ensemble inputs
    rgcn-eval ... --dump-degrees dumps/deg.tsv \
        --dump-frequencies dumps/freq             # breakdown TSVs

Reads the newest checkpoint written by training (``train.py`` saves to
the settings' ExperimentName path); ``--checkpoint`` overrides.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Evaluate a trained checkpoint.")
    parser.add_argument("--settings", required=True)
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--checkpoint", default=None,
                        help="Checkpoint path prefix (default: the "
                             "settings' ExperimentName, as written by "
                             "training).")
    parser.add_argument("--split", default="test",
                        choices=["train", "valid", "test"])
    parser.add_argument("--limit", type=int, default=None,
                        help="Evaluate only the first N triples.")
    parser.add_argument("--dump-scores", default=None, metavar="DIR",
                        help="Write <DIR>/subjects.<split> and "
                             "<DIR>/objects.<split> full-entity score "
                             "dumps — the ensemble tool's expected "
                             "layout (``evaluation.py:391-408`` format; "
                             "tools/ensemble.py --p1/--p2 take DIR).")
    parser.add_argument("--dump-degrees", default=None, metavar="PREFIX",
                        help="Write <PREFIX>_in.tsv / _out.tsv per-degree "
                             "MRR TSVs.")
    parser.add_argument("--dump-frequencies", default=None, metavar="PREFIX",
                        help="Write <PREFIX>_vertex.tsv / _relation.tsv "
                             "per-frequency MRR TSVs.")
    parser.add_argument("--raw", action="store_true",
                        help="Dump breakdowns from raw (unfiltered) ranks.")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from relationprediction_tpu import config as config_lib
    from relationprediction_tpu.data import dataset as dataset_lib
    from relationprediction_tpu.data import synthetic
    from relationprediction_tpu.evaluation import Scorer
    from relationprediction_tpu.models.build import (JittedModelView,
                                                     build_model)
    from relationprediction_tpu.training import checkpoint as ckpt_lib

    cfg = config_lib.load(args.settings)
    if args.dataset.startswith("synth:"):
        ds = synthetic.like(args.dataset.split(":", 1)[1])
    else:
        ds = dataset_lib.load(args.dataset, metric=cfg.training.metric)
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    model = build_model(cfg)

    ckpt_path = args.checkpoint or cfg.training.experiment_name
    state = ckpt_lib.restore_latest(ckpt_path)
    if state is None:
        raise SystemExit(f"no checkpoint found at {ckpt_path!r} "
                         f"(train first, or pass --checkpoint)")
    params = state["params"]
    print(f"checkpoint: {ckpt_path} (step {state['step']})")

    view = JittedModelView(model)
    eval_graph = None
    if model.needs_graph():
        eval_graph = model.make_graph(
            ds.train, pad_to=-(-len(ds.train) // 128) * 128)

    scorer = Scorer(metric=cfg.training.metric)
    for t in (ds.train, ds.valid, ds.test):
        scorer.register_data(t)
    scorer.register_degrees(ds.train)
    scorer.register_model(view, params, eval_graph,
                          n_entities=ds.n_entities)
    scorer.finalize_frequency_computation(ds.all_triples())

    triples = {"train": ds.train, "valid": ds.valid,
               "test": ds.test}[args.split]
    if args.limit:
        triples = triples[:args.limit]
    print(f"evaluating {len(triples)} {args.split} triples "
          f"on {ds.name}")
    summary = scorer.compute_scores(triples)
    summary.pretty_print()

    kind = "Raw" if args.raw else "Filtered"
    for prefix in (args.dump_degrees, args.dump_frequencies):
        if prefix and os.path.dirname(prefix):
            os.makedirs(os.path.dirname(prefix), exist_ok=True)
    if args.dump_degrees:
        fi = f"{args.dump_degrees}_in.tsv"
        fo = f"{args.dump_degrees}_out.tsv"
        summary.dump_degrees(fi, fo, filter=kind)
        print(f"wrote {fi} {fo}")
    if args.dump_frequencies:
        vf = f"{args.dump_frequencies}_vertex.tsv"
        rf = f"{args.dump_frequencies}_relation.tsv"
        summary.dump_frequencies(vf, rf, filter=kind)
        print(f"wrote {vf} {rf}")
    if args.dump_scores:
        os.makedirs(args.dump_scores, exist_ok=True)
        sf = os.path.join(args.dump_scores, f"subjects.{args.split}")
        of = os.path.join(args.dump_scores, f"objects.{args.split}")
        scorer.dump_all_scores(triples, sf, of)
        print(f"wrote {sf} {of}")


if __name__ == "__main__":
    main()
