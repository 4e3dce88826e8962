#!/usr/bin/env python
"""Op-level jax.profiler trace of the factored-binomial decoder backward.

Round-4 verdict item 2: the decoder fwd+bwd over frozen codes is ~20 ms
of the 45 ms production step and was attacked only with formula
rewrites; this captures a device trace and names the HLOs behind it.

Stages (pick with --stage):
  dec   — factored decoder fwd+bwd over FROZEN codes (the ~20 ms term)
  step  — the full factored-binomial train step
  enc   — encoder fwd+bwd only

Prints the top HLOs by per-dispatch self time, grouped, plus a category
rollup (fusion kinds, copies, convolutions/dots, custom-calls/Pallas).

Usage: python benchmarks/decoder_trace.py --stage dec [--keep-dir DIR]
"""
import argparse
import collections
import glob
import os
import re
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DISPATCH = 10


def parse_xspace(trace_dir, n_dispatch):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    per_op = collections.Counter()  # name -> total ps
    per_cat = collections.Counter()
    n_ev = 0
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                name = md.name
                per_op[name] += ev.duration_ps
                per_cat[categorize(name)] += ev.duration_ps
                n_ev += 1
    return per_op, per_cat, n_ev


def categorize(name):
    m = re.match(r"%?([\w.\-]+?)(?:[._]\d+)*\s*=", name)
    op = m.group(1) if m else name[:40]
    base = re.sub(r"[._]\d+$", "", op)
    if "custom-call" in name or "tpu_custom_call" in name:
        return "custom-call (Pallas)"
    for kind in ("fusion", "copy", "convolution", "dot", "transpose",
                 "dynamic-slice", "dynamic-update-slice", "scatter",
                 "gather", "sort", "reduce", "bitcast", "all-reduce",
                 "iota", "select-and-scatter"):
        if base.startswith(kind) or f" {kind}(" in name[:120]:
            return kind
    return base


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="dec", choices=["dec", "step", "enc"])
    p.add_argument("--keep-dir", default=None,
                   help="keep the raw trace under this directory")
    p.add_argument("--top", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    from relationprediction_tpu import config as config_lib
    from relationprediction_tpu.data import synthetic
    from relationprediction_tpu.graph import build_graph_batch
    from relationprediction_tpu.models import build_model
    from relationprediction_tpu.training import BatchPipeline
    from relationprediction_tpu.training.device_sampling import (
        device_negative_parts)
    from relationprediction_tpu.training.optimizers import build_optimizer

    ds = synthetic.like("FB15k-237", seed=0)
    cfg = config_lib.load(os.path.join(os.path.dirname(__file__), "..",
                                       "settings", "gcn_block.exp"))
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder,
                                    message_precision="bfloat16"),
        decoder=dataclasses.replace(cfg.decoder,
                                    stream_precision="bfloat16"))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    pipe = BatchPipeline(model, cfg, ds, np.random.default_rng(0),
                         sampler="uniform", device_negatives=True)
    batch = pipe.next()
    g = batch.graph
    real = np.asarray(g.mask) > 0
    edges = np.stack([np.asarray(g.senders)[real],
                      np.asarray(g.relations)[real],
                      np.asarray(g.receivers)[real]], axis=1)
    graph = build_graph_batch(edges, cfg.entity_count, cfg.relation_count,
                              pad_to=g.n_padded_edges, staircase2=True)

    rate = cfg.training.negative_sample_rate
    V = cfg.entity_count
    key = jax.random.PRNGKey(0)
    values_f, co_f = device_negative_parts(batch.triples, rate, V, key)

    if args.stage == "dec":
        enc_fixed = model.encode(params, graph, deterministic=True, rng=key)
        enc_fixed = jax.tree_util.tree_map(jax.lax.stop_gradient, enc_fixed)
        from relationprediction_tpu.models.build import EncodeResult

        def dec_loss(codes):
            er = EncodeResult(codes, enc_fixed.relation_codes)
            saved = model.encode
            model.encode = lambda *a, **k: er
            try:
                return model.loss_binomial_factored(
                    params, None, batch.triples, batch.mask, values_f,
                    co_f, deterministic=True)
            finally:
                model.encode = saved

        fn = jax.jit(lambda c: jax.grad(dec_loss)(c).sum())
        arg = enc_fixed.entity_codes
    elif args.stage == "enc":
        fn = jax.jit(lambda p: jax.tree_util.tree_reduce(
            lambda a, b: a + b.sum(),
            jax.grad(lambda q: model.encode(
                q, graph, deterministic=True,
                rng=key).entity_codes.sum())(p), 0.0))
        arg = params
    else:
        opt = build_optimizer(cfg.optimizer)
        opt_state = opt.init(params)

        def step(p):
            loss, gr = jax.value_and_grad(
                lambda q: model.loss_binomial_factored(
                    q, graph, batch.triples, batch.mask, values_f, co_f,
                    rng=key, deterministic=False))(p)
            updates, _ = opt.update(gr, opt_state, p)
            return loss + jax.tree_util.tree_reduce(
                lambda a, b: a + b.sum(), updates, 0.0) * 1e-30
        fn = jax.jit(step)
        arg = params

    float(fn(arg))  # compile
    float(fn(arg))

    trace_dir = args.keep_dir or tempfile.mkdtemp(prefix="dectrace_")
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(N_DISPATCH):
            fn(arg)
        jax.effects_barrier()

    per_op, per_cat, n_ev = parse_xspace(trace_dir, N_DISPATCH)
    total_ms = sum(per_op.values()) / 1e9 / N_DISPATCH
    print(f"\nstage={args.stage}  dispatches={N_DISPATCH}  "
          f"events={n_ev}  device total {total_ms:.2f} ms/dispatch\n")
    print("== category rollup ==")
    for cat, ps in per_cat.most_common(15):
        print(f"  {ps / 1e9 / N_DISPATCH:8.3f} ms  {cat}")
    print(f"\n== top {args.top} ops ==")
    for name, ps in per_op.most_common(args.top):
        print(f"  {ps / 1e9 / N_DISPATCH:8.3f} ms  {name[:150]}")
    if not args.keep_dir:
        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
