#!/usr/bin/env python
"""Headline benchmark: relational SpMM throughput (edges/sec/chip).

Workload: one full block-diagonal R-GCN layer (settings/gcn_block.exp
shapes — d=500, 100 blocks of 5x5, FB15k-237 entity/relation counts,
Zipfian relation popularity) — per-edge relational transform in both
directions + degree-normalized aggregation + self-loop, the computation the
reference runs through ``tf.sparse_tensor_dense_matmul``
(``gcn_basis_concat.py:69-83``). The production path is the relation-
bucketed transform + staircase one-hot MXU scatter (ops/staircase.py).

``vs_baseline`` is the speedup over a reference-style implementation on the
same hardware (per-edge weight-stack gather + unsorted scatter, the direct
translation of the reference's edge-parallel formulation) — >1.0 means the
TPU-native layout beats a faithful port.

The JSON line also carries an ``extra`` dict: the bf16-message layer
variant and full TRAIN-STEP metrics (ms/step, steps/s, message-edges/s)
for the three negative-sampling protocols, measured through the production
TrainLoop on FB15k-237-scale synthetic data.

Timing methodology: this environment's TPU transport adds ~28 ms latency
per host->device call and its `block_until_ready` can return before the
device finishes, so layer ops are repeated N times INSIDE one executable
(data-dependency-chained fori_loop) with a single scalar fetch at the end.
Train-step numbers time the real dispatch loop (host pipeline included).

Capture-proofing: backend initialization (the axon TPU tunnel can be
transiently UNAVAILABLE) is retried with exponential backoff; individual
extra metrics degrade to null instead of failing the whole run.
"""
from __future__ import annotations

import json
import sys
import time
import traceback

import numpy as np

N_ITERS = 20
INIT_RETRIES = 6


def _init_backend():
    """jax.devices() with retry/backoff around transient tunnel failures."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    delay = 2.0
    for attempt in range(INIT_RETRIES):
        try:
            devs = jax.devices()
            print(f"backend ready: {devs[0]} ({len(devs)} device(s))",
                  file=sys.stderr)
            return jax
        except Exception as e:  # noqa: BLE001 - backend init is opaque
            print(f"backend init attempt {attempt + 1}/{INIT_RETRIES} "
                  f"failed: {e}", file=sys.stderr)
            if attempt == INIT_RETRIES - 1:
                raise
            try:  # drop any cached failed-backend state before retrying
                jax.extend.backend.clear_backends()
            except Exception:  # noqa: BLE001
                pass
            time.sleep(delay)
            delay = min(delay * 2, 60.0)


def timed(fn, *args):
    """Differenced in-graph timing (round-5 methodology fix).

    The tunnel's fixed per-dispatch overhead is ~25 ms; dividing one
    wall-clock call by N_ITERS=20 (rounds 1-4) silently added ~1.25 ms
    to every per-iteration number — exactly the artifact behind the
    bogus 277 GB/s HBM 'ceiling' (benchmarks/membw_probe2.py). Running
    the same loop at two trip counts and taking the slope
    (T(N2)-T(N1))/(N2-N1) cancels the fixed cost exactly; the result is
    the true on-device per-iteration time (the portable number a
    co-located host would see).
    """
    import jax

    def build(iters):
        @jax.jit
        def f(*a):
            def it(k, acc):
                return acc + fn(*a, acc)
            return jax.lax.fori_loop(0, iters, it, 0.0)
        return f

    f1, f2 = build(N_ITERS), build(N_ITERS * 5)
    t0 = time.perf_counter()
    float(f1(*args))  # compile + first run
    compile_s = time.perf_counter() - t0
    float(f2(*args))
    t1 = min(_wall(f1, *args) for _ in range(2))
    t2 = min(_wall(f2, *args) for _ in range(2))
    return (t2 - t1) / (N_ITERS * 4), compile_s


def _wall(f, *args):
    t0 = time.perf_counter()
    float(f(*args))
    return time.perf_counter() - t0


def bench_layer(jax):
    """Production staircase layer vs reference-style per-edge formulation."""
    import jax.numpy as jnp

    from relationprediction_tpu.graph import build_graph_batch
    from relationprediction_tpu.models import encoders as enc

    V, R, D, B = 14541, 237, 500, 100
    E = 131072
    rng = np.random.default_rng(0)

    rel_w = 1.0 / np.arange(1, R + 1) ** 1.0
    rel_w /= rel_w.sum()
    edges = np.stack([
        rng.integers(0, V, E),
        rng.choice(R, size=E, p=rel_w),
        rng.integers(0, V, E)], axis=1).astype(np.int32)

    params = enc.init_gcn_layer(jax.random.PRNGKey(0), "block",
                                n_relations=R, d_in=D, d_out=D, n_bases=B)
    features = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))

    def layer(graph, agg_dtype=None):
        def body(params, feats, acc):
            out = enc.apply_gcn_layer(
                params, "block", graph, feats + acc, n_bases=B,
                use_nonlinearity=True, dropout_keep=1.0, deterministic=True,
                rng=None, n_vertices=V, agg_dtype=agg_dtype)
            return out.sum()
        return body

    # Production layout: fused v2 — gather + relational transform +
    # one-hot MXU scatter in one kernel pass per direction
    # (ops/staircase2.py); bf16 edge streams are the production setting.
    g_prod = build_graph_batch(edges, V, R, staircase2=True)
    # Round-2 layout: relation-bucketed transform + v1 staircase scatter.
    g_v1 = build_graph_batch(edges, V, R, bucket_size=64, staircase=True)
    # Reference-style: flat edge list, per-edge weight gather, raw scatter.
    g_flat = build_graph_batch(edges, V, R, pad_to=E)

    dt, c1 = timed(layer(g_prod, jnp.bfloat16), params, features)
    dt_f32, _ = timed(layer(g_prod), params, features)
    dt_v1, _ = timed(layer(g_v1), params, features)
    dt_base, c2 = timed(layer(g_flat), params, features)
    # Same-precision baseline: the reference-style formulation ALSO in
    # bf16 streams, so the headline vs_baseline ratio never mixes
    # precisions (round-3 verdict item).
    dt_base_bf16, _ = timed(layer(g_flat, jnp.bfloat16), params, features)

    print(f"block R-GCN layer (fused v2, bf16): {dt * 1e3:.2f} ms "
          f"({E / dt / 1e6:.2f}M edges/s, compile {c1:.0f}s); "
          f"fused v2 f32: {dt_f32 * 1e3:.2f} ms "
          f"({E / dt_f32 / 1e6:.2f}M edges/s); "
          f"round-2 v1 staircase: {dt_v1 * 1e3:.2f} ms "
          f"({E / dt_v1 / 1e6:.2f}M edges/s); "
          f"reference-style per-edge gather: f32 {dt_base * 1e3:.2f} ms / "
          f"bf16 {dt_base_bf16 * 1e3:.2f} ms "
          f"({E / dt_base_bf16 / 1e6:.2f}M edges/s, compile {c2:.0f}s)",
          file=sys.stderr)
    return dict(edges=E, dt=dt, dt_f32=dt_f32, dt_v1=dt_v1,
                dt_base=dt_base, dt_base_bf16=dt_base_bf16,
                compile_s=c1)


def bench_train_steps(jax, modes=("binomial", "split", "shared"),
                      warmup=12, iters=20):
    """Full production train step (TrainLoop dispatch loop, host pipeline
    included) per negative-sampling protocol."""
    import dataclasses
    import os

    from relationprediction_tpu import config as config_lib
    from relationprediction_tpu.data import synthetic
    from relationprediction_tpu.models import build_model
    from relationprediction_tpu.training import TrainLoop

    ds = synthetic.like("FB15k-237", seed=0)
    cfg = config_lib.load(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "settings", "gcn_block.exp"))
    # Production precision: bf16 encoder message + decoder streams
    # (f32 accumulation; docs/ROOFLINE.md §4, quality-gated by
    # tests/test_bf16_streams.py).
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder,
                                    message_precision="bfloat16"),
        decoder=dataclasses.replace(cfg.decoder,
                                    stream_precision="bfloat16"))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    model = build_model(cfg)

    out = {}
    compile_s = {}
    for mode in modes:
        try:
            # Production default K=8 chunked dispatch: it amortizes the
            # tunnel's per-dispatch RPC (measured 70.6 vs 144 ms/step in
            # round 4 — the tunnel's per-dispatch cost varies by session,
            # and K=8 is robust to it).
            loop = TrainLoop(model, cfg, ds, seed=0, log=lambda s: None,
                             prefetch=True, negative_mode=mode)
            params, opt_state = loop.init_state()
            # First dispatch = step compile (round-5 verdict item 6:
            # track it so a compile regression is visible; includes
            # compilation-cache hits when /tmp/jaxcache is warm).
            t0 = time.perf_counter()
            result = loop.fit(params, opt_state, max_iterations=1)
            compile_s[mode] = round(time.perf_counter() - t0, 1)
            result = loop.fit(result.params, result.opt_state,
                              start_iteration=1, max_iterations=warmup)
            t0 = time.perf_counter()
            result = loop.fit(result.params, result.opt_state,
                              start_iteration=warmup,
                              max_iterations=warmup + iters)
            dt = (time.perf_counter() - t0) / iters
            edges = loop.pipeline.split_size
            out[mode] = {
                "ms_per_step": round(dt * 1e3, 2),
                "steps_per_sec": round(1.0 / dt, 2),
                "msg_edges_per_sec": round(edges / dt, 1),
                # Protocol comparability (docs/ROOFLINE.md §4): 'binomial'
                # is the reference's exact corruption protocol; 'split'
                # factorizes the same rate; 'shared' scores against a
                # shared pool — a DIFFERENT objective/distribution whose
                # step time must not be quoted as the reference-protocol
                # number.
                "protocol": ("reference-exact" if mode == "binomial" else
                             "factorized-equivalent" if mode == "split"
                             else "shared-pool (different objective)"),
                # Wall-clock through TrainLoop on THIS tunneled chip
                # includes ~30 ms/step dispatch+h2d transport that a
                # co-located host does not pay; the in-graph device
                # step (docs/ROOFLINE.md §4) is binomial(factored) 45.3
                # / split 45.1 ms at these shapes.
                "note": "wall incl. ~30ms/step tunnel transport",
                "precision": "bf16 streams, f32 accumulate",
            }
            print(f"train step [{mode}]: {dt * 1e3:.1f} ms/step "
                  f"({edges / dt / 1e6:.2f}M msg-edges/s)", file=sys.stderr)
        except Exception:  # noqa: BLE001 - degrade, don't lose the capture
            traceback.print_exc()
            out[mode] = None
    return out, compile_s


def bench_device_step(jax):
    """In-graph (differenced fori-loop) timing of the FULL factored
    binomial device step — loss fwd+bwd + Adam update at FB15k-237
    training shapes. This is the PORTABLE step number: the TrainLoop
    wall numbers above include per-dispatch tunnel RPC that varies
    ±40 % session to session (observed 68-95 ms for identical code),
    while this one is stable to ~±5 % (docs/ROOFLINE.md §4)."""
    import dataclasses
    import os

    import jax.numpy as jnp  # noqa: F401

    from relationprediction_tpu import config as config_lib
    from relationprediction_tpu.data import synthetic
    from relationprediction_tpu.graph import build_graph_batch
    from relationprediction_tpu.models import build_model
    from relationprediction_tpu.training import BatchPipeline
    from relationprediction_tpu.training.device_sampling import (
        device_negative_parts)
    from relationprediction_tpu.training.optimizers import build_optimizer

    ds = synthetic.like("FB15k-237", seed=0)
    cfg = config_lib.load(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "settings", "gcn_block.exp"))
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
    opt = build_optimizer(cfg.optimizer)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(0)

    def full_step(p, s_, acc):
        # Fold the loop carry into the key: 0*acc is not provably 0 for
        # floats (NaN), so the per-step corruption draw cannot be
        # loop-invariant-hoisted out of the timing loop (round-5 review
        # finding — hoisted sampling silently under-reported the step).
        kk = jax.random.fold_in(key, (acc * 0).astype(jnp.int32))
        values, co = device_negative_parts(batch.triples, rate,
                                           cfg.entity_count, kk)
        loss, gr = jax.value_and_grad(
            lambda q: model.loss_binomial_factored(
                q, graph, batch.triples, batch.mask, values, co,
                rng=key, deterministic=False))(
            jax.tree_util.tree_map(lambda x: x + acc, p))
        updates, _ = opt.update(gr, s_, p)
        upd = jax.tree_util.tree_reduce(lambda a, b: a + b.sum(),
                                        updates, 0.0)
        return jnp.tanh(loss + upd * 1e-30) * 1e-6

    dt, compile_s = timed(full_step, params, opt_state)
    n_pos = int(np.asarray(batch.mask).sum())
    print(f"device step (in-graph, binomial factored): {dt * 1e3:.2f} ms "
          f"({n_pos * (rate + 1) / dt / 1e6:.2f}M slot-scores/s, "
          f"compile {compile_s:.0f}s)", file=sys.stderr)
    return {
        "device_step_ms": round(dt * 1e3, 2),
        "slot_scores_per_sec": round(n_pos * (rate + 1) / dt, 1),
        "note": "full loss fwd+bwd + Adam, in-graph differenced timing "
                "(portable; excludes tunnel dispatch + host pipeline, "
                "which prefetch overlaps on a co-located host)",
    }


def bench_eval(jax, chunk=1000, n_chunks=8):
    """Evaluation pass: chunked all-entity scoring at FB15k-237 scale
    (round-5 verdict item 8 — the check-cadence cost was unmeasured).

    Times the production Scorer path's device work: subject + object
    [chunk, V] score matrices from a JittedModelView over the full
    training graph, per 1000-triple chunk (the reference's chunking,
    ``evaluation.py:334-346``).
    """
    import dataclasses
    import os

    from relationprediction_tpu import config as config_lib
    from relationprediction_tpu.data import synthetic
    from relationprediction_tpu.models import build_model
    from relationprediction_tpu.models.build import JittedModelView

    ds = synthetic.like("FB15k-237", seed=0)
    cfg = config_lib.load(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "settings", "gcn_block.exp"))
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder,
                                    message_precision="bfloat16"),
        decoder=dataclasses.replace(cfg.decoder,
                                    stream_precision="bfloat16"))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    graph = model.make_graph(
        ds.train, pad_to=-(-len(ds.train) // 128) * 128)
    view = JittedModelView(model)

    # The PRODUCTION path: Scorer -> chunked all-entity scoring with
    # on-device rank computation — only [chunk]-sized rank vectors cross
    # the tunnel. (Fetching the raw [chunk, V] score matrices instead
    # measures ~6.5 s/chunk here — 40x worse, all transport — which is
    # why ranks-on-device is the design; evaluation/ranking.py.)
    from relationprediction_tpu.evaluation import Scorer
    scorer = Scorer(metric="MRR")
    for t in (ds.train, ds.valid, ds.test):
        scorer.register_data(t)
    scorer.register_model(view, None, graph, n_entities=ds.n_entities)
    scorer.set_params(params)
    n_eval = chunk * n_chunks
    trip = np.asarray(ds.valid[:n_eval], dtype=np.int32)
    t0 = time.perf_counter()
    scorer.compute_mrr_scores(trip[:chunk])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    scorer.compute_mrr_scores(trip)
    dt = (time.perf_counter() - t0) / n_chunks
    print(f"eval [{chunk}-triple chunk, V={ds.n_entities}] subj+obj "
          f"ranks: {dt * 1e3:.1f} ms ({chunk / dt:.0f} triples/s, "
          f"first-chunk compile+encode {compile_s:.0f}s)",
          file=sys.stderr)
    return {
        "eval_chunk_ms": round(dt * 1e3, 1),
        "eval_triples_per_sec": round(chunk / dt, 1),
        "eval_compile_s": round(compile_s, 1),
        "note": ("production Scorer path: both-direction all-entity "
                 "scoring + on-device raw/filtered ranks per "
                 "1000-triple chunk; encode cached across chunks"),
    }


def main() -> None:
    jax = _init_backend()

    layer = bench_layer(jax)
    steps, step_compile = bench_train_steps(jax)
    try:
        device_step = bench_device_step(jax)
    except Exception:  # noqa: BLE001 - degrade, don't lose the capture
        traceback.print_exc()
        device_step = None
    try:
        eval_stats = bench_eval(jax)
    except Exception:  # noqa: BLE001 - degrade, don't lose the capture
        traceback.print_exc()
        eval_stats = None

    edges_per_sec = layer["edges"] / layer["dt"]
    print(json.dumps({
        "metric": "relational_spmm_block_edges_per_sec_per_chip",
        "value": round(edges_per_sec, 1),
        "unit": "edges/s/chip",
        # SAME-precision ratio: fused bf16 layer vs reference-style bf16
        # layer on the same chip (f32/f32 ratio in extra).
        "vs_baseline": round(layer["dt_base_bf16"] / layer["dt"], 3),
        "extra": {
            # schema 2 (round 4+): vs_baseline is the SAME-precision
            # bf16/bf16 ratio; schema 1 (rounds 1-3) was f32-reference /
            # bf16-fused. Trend tooling: compare vs_baseline only within
            # a schema; vs_baseline_f32 is the schema-1 definition.
            "bench_schema": 2,
            "layer_ms": round(layer["dt"] * 1e3, 3),
            "layer_f32_ms": round(layer["dt_f32"] * 1e3, 3),
            "layer_v1_staircase_ms": round(layer["dt_v1"] * 1e3, 3),
            "vs_round2_v1": round(layer["dt_v1"] / layer["dt"], 3),
            "reference_style_layer_ms": round(layer["dt_base"] * 1e3, 3),
            "reference_style_layer_bf16_ms":
                round(layer["dt_base_bf16"] * 1e3, 3),
            "vs_baseline_f32": round(layer["dt_base"] / layer["dt_f32"], 3),
            "layer_compile_s": round(layer["compile_s"], 1),
            # First-dispatch seconds for the full production train step
            # (per negative mode; reflects /tmp/jaxcache state).
            "step_compile_s": step_compile,
            "train_step": steps,
            "device_step": device_step,
            "eval": eval_stats,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
