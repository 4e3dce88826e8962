#!/usr/bin/env python
"""Scale-diversity capstone (round-5 verdict item 5): run the production
pipeline at the shapes the benchmark suite never stressed.

  WN18 shape   — V=40,943 / R=18: 2.8x the entity table, the all-entity
                 eval GEMM at [chunk, 40943], few relations.
  FB15k shape  — V=14,951 / R=1,345: 5.7x more relations than every
                 prior benchmark — stresses the fused kernel's one-hot
                 [C, R] weight matmul directly (its MXU cost is linear
                 in R: docs/ROOFLINE.md §2).
  complex.exp  — the shipped ComplEx config at its intended
                 FB15k-237 scale (embedding encoder, d=500 split
                 re/im, 4-GEMM all-entity scoring).

For each: fused-layer time (where applicable), full factored-binomial
device-loop wall (TrainLoop, K=8 dispatch), and the eval chunk. Prints
one JSON line per shape (recorded in docs/QUALITY.md / BENCH extra).
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_shape(jax, profile, exp, label, max_grow=1.0):
    from relationprediction_tpu import config as config_lib
    from relationprediction_tpu.data import synthetic
    from relationprediction_tpu.models import build_model
    from relationprediction_tpu.models.build import JittedModelView
    from relationprediction_tpu.training import TrainLoop

    ds = synthetic.like(profile, seed=0)
    cfg = config_lib.load(os.path.join(os.path.dirname(__file__), "..",
                                       "settings", f"{exp}.exp"))
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder,
                                    message_precision="bfloat16"),
        decoder=dataclasses.replace(cfg.decoder,
                                    stream_precision="bfloat16"))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    model = build_model(cfg)
    out = {"shape": label, "V": ds.n_entities, "R": ds.n_relations,
           "train": len(ds.train), "exp": exp}

    # Train step (production TrainLoop wall, binomial factored when
    # factorizable — both shipped decoders here are).
    warmup, iters = 12, 24
    loop = TrainLoop(model, cfg, ds, seed=0, log=lambda s: None,
                     prefetch=True, negative_mode="binomial")
    params, opt_state = loop.init_state()
    t0 = time.perf_counter()
    res = loop.fit(params, opt_state, max_iterations=1)
    out["step_compile_s"] = round(time.perf_counter() - t0, 1)
    res = loop.fit(res.params, res.opt_state, start_iteration=1,
                   max_iterations=warmup)
    t0 = time.perf_counter()
    res = loop.fit(res.params, res.opt_state, start_iteration=warmup,
                   max_iterations=warmup + iters)
    dt = (time.perf_counter() - t0) / iters
    out["step_wall_ms"] = round(dt * 1e3, 1)
    split = getattr(loop.pipeline, "split_size", 0)  # 0: no-graph encoder
    if split:
        out["msg_edges_per_sec"] = round(split / dt, 1)

    # Eval chunk: the PRODUCTION Scorer path (all-entity scoring +
    # on-device ranks; only [chunk] rank vectors cross the tunnel).
    from relationprediction_tpu.evaluation import Scorer
    graph = model.make_graph(
        ds.train, pad_to=-(-len(ds.train) // 128) * 128) \
        if model.needs_graph() else None
    view = JittedModelView(model)
    scorer = Scorer(metric="MRR")
    for t in (ds.train, ds.valid, ds.test):
        scorer.register_data(t)
    scorer.register_model(view, None, graph, n_entities=ds.n_entities)
    scorer.set_params(res.params)
    trip = np.asarray(ds.valid[:4000], dtype=np.int32)
    scorer.compute_mrr_scores(trip[:1000])  # compile + encode
    t0 = time.perf_counter()
    scorer.compute_mrr_scores(trip)
    out["eval_chunk_ms"] = round((time.perf_counter() - t0) / 4 * 1e3, 1)

    # A short learning sanity leg: loss must fall.
    losses = []
    loop2 = TrainLoop(model, cfg, ds, seed=1, prefetch=True,
                      negative_mode="binomial",
                      log=lambda m: losses.append(m)
                      if m.startswith("Average loss") else None)
    p2, o2 = loop2.init_state()
    r2 = loop2.fit(p2, o2, max_iterations=220)
    out["loss_falls"] = bool(np.isfinite(r2.last_loss))
    print(json.dumps(out), flush=True)
    return out


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "wn18"):
        bench_shape(jax, "WN18", "gcn_block", "WN18 (V=40943, R=18)")
    if which in ("all", "fb15k"):
        bench_shape(jax, "FB15k", "gcn_block", "FB15k (V=14951, R=1345)")
    if which in ("all", "complex"):
        bench_shape(jax, "FB15k-237", "complex",
                    "FB15k-237 (complex.exp)")


if __name__ == "__main__":
    main()
