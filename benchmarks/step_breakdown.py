#!/usr/bin/env python
"""Break the gcn_block train step into stages and time each on the TPU.

Produces the table committed in docs/ROOFLINE.md §train-step. Stages are
timed with the in-graph fori_loop methodology (host<->device transport in
this environment costs ~28 ms per dispatch, which would swamp ms-scale
stages). The host pipeline is timed separately in wall-clock.

--layout {sc2,v1,flat} selects the aggregation layout for the encoder:
  sc2  — fused v2 kernel (ops/staircase2.py), the big-graph champion
  v1   — round-2 production: relation-bucketed transform + v1 staircase
  flat — plain segment-sum path
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layout", default="sc2", choices=["sc2", "v1", "flat"])
    p.add_argument("--negative-mode", default="binomial",
                   choices=["binomial", "binomial_factored", "split",
                            "shared"])
    p.add_argument("--bf16", action="store_true",
                   help="bf16 encoder message + decoder stream precision")
    p.add_argument("--exp", default="gcn_block",
                   choices=["gcn_block", "gcn_basis"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from relationprediction_tpu import config as config_lib
    from relationprediction_tpu.data import synthetic
    from relationprediction_tpu.graph import build_graph_batch
    from relationprediction_tpu.models import build_model
    from relationprediction_tpu.training import BatchPipeline
    from relationprediction_tpu.training.device_sampling import (
        device_negative_entities_split, device_negative_sample)
    from relationprediction_tpu.training.optimizers import build_optimizer

    ds = synthetic.like("FB15k-237", seed=0)
    cfg = config_lib.load(os.path.join(os.path.dirname(__file__), "..",
                                       "settings", f"{args.exp}.exp"))
    if args.bf16:
        import dataclasses
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

    t0 = time.perf_counter()
    n_host = 10
    for _ in range(n_host):
        batch = pipe.next()
    host_ms = (time.perf_counter() - t0) / n_host * 1e3
    print(f"{'host pipeline (sample+split+layout)':40s} "
          f"         {host_ms:8.2f} ms", flush=True)

    # Rebuild the batch graph in the requested layout from its real edges.
    g = batch.graph
    real = np.asarray(g.mask) > 0
    edges = np.stack([np.asarray(g.senders)[real],
                      np.asarray(g.relations)[real],
                      np.asarray(g.receivers)[real]], axis=1)
    pad = g.n_padded_edges
    if args.layout == "sc2":
        graph = build_graph_batch(edges, cfg.entity_count,
                                  cfg.relation_count, pad_to=pad,
                                  staircase2=True)
    elif args.layout == "v1":
        graph = build_graph_batch(edges, cfg.entity_count,
                                  cfg.relation_count, bucket_size=64,
                                  staircase=True)
    else:
        graph = build_graph_batch(edges, cfg.entity_count,
                                  cfg.relation_count, pad_to=pad)

    rate = cfg.training.negative_sample_rate
    V = cfg.entity_count
    N = 10

    def timed(label, body, *bargs):
        """In-graph timing with a loop-carried PERTURBATION of the first
        argument (a params pytree): every leaf gets `+ acc` added, so NO
        stage computation is loop-invariant and XLA cannot hoist it out
        of the fori_loop. (A `result + acc * 0` epilogue — the round-2/3
        harness — lets the whole stage hoist and times a no-op; that bug
        made the early round-3 step numbers ~10x too good.)"""
        def build(iters):
            @jax.jit
            def f(p0, *a):
                def it(k, acc):
                    p = jax.tree_util.tree_map(lambda x: x + acc, p0)
                    # squash: the feedback never overflows the perturbation
                    return jnp.tanh(body(p, *a, acc)) * 1e-6
                return jax.lax.fori_loop(0, iters, it, 0.0)
            return f
        # Differenced timing (round 5): two trip counts cancel the
        # tunnel's ~25 ms fixed dispatch cost, which at N=10 inflated
        # every round-4 stage number by ~2.5 ms (see bench.py:timed).
        f1, f2 = build(N), build(N * 5)
        t0 = time.perf_counter()
        float(f1(*bargs))
        tc = time.perf_counter() - t0
        float(f2(*bargs))

        def wall(f):
            t0 = time.perf_counter()
            float(f(*bargs))
            return time.perf_counter() - t0
        t1 = min(wall(f1) for _ in range(2))
        t2 = min(wall(f2) for _ in range(2))
        dt = (t2 - t1) / (N * 4)
        print(f"{label:40s} compile {tc:6.1f}s  {dt * 1e3:8.2f} ms",
              flush=True)
        return dt

    key = jax.random.PRNGKey(0)
    triples, labels, mask = device_negative_sample(
        batch.triples, batch.mask, rate, V, key)

    from relationprediction_tpu.models.decoders import weighted_ce_loss

    def loss_from(p, enc_result, acc):
        e1 = enc_result.entity_codes[triples[:, 0]]
        r = enc_result.relation_codes[triples[:, 1]]
        e2 = enc_result.entity_codes[triples[:, 2]]
        en = model.decoder.energies(p["decoder"], e1, r, e2)
        return weighted_ce_loss(en, labels, mask)

    timed("encoder fwd (2 block layers)",
          lambda p, acc: model.encode(
              p, graph, deterministic=True,
              rng=key).entity_codes.sum() + acc * 0, params)
    timed("full loss fwd",
          lambda p, acc: model.loss(
              p, graph, triples, labels, mask, rng=key,
              deterministic=True) + acc * 0, params)
    timed("decoder-only fwd (precomputed codes)",
          lambda p, acc: loss_from(
              p, model.encode(p, graph, deterministic=True, rng=key),
              acc) + acc * 0, params)
    timed("loss fwd+bwd (grads)",
          lambda p, acc: jax.tree_util.tree_reduce(
              lambda a, b: a + b.sum(),
              jax.grad(lambda q: model.loss(q, graph, triples, labels,
                                            mask, rng=key,
                                            deterministic=False))(p),
              0.0) + acc * 0, params)
    # encoder-only grads (loss = sum of codes) isolates encoder backward
    timed("encoder fwd+bwd only",
          lambda p, acc: jax.tree_util.tree_reduce(
              lambda a, b: a + b.sum(),
              jax.grad(lambda q: model.encode(
                  q, graph, deterministic=True,
                  rng=key).entity_codes.sum())(p), 0.0) + acc * 0, params)

    # factored-binomial decoder isolated: frozen precomputed codes, so
    # fwd / fwd+bwd time is PURE decoder-side (gathers, factors, CE,
    # and the backward scatters into the code tables).
    from relationprediction_tpu.training.device_sampling import (
        device_negative_parts)
    values_f, co_f = device_negative_parts(batch.triples, rate, V, key)
    enc_fixed = model.encode(params, graph, deterministic=True, rng=key)
    enc_fixed = jax.tree_util.tree_map(jax.lax.stop_gradient, enc_fixed)

    def factored_dec_loss(codes, rel_codes, dp, acc):
        # The REAL production loss body with the encoder frozen: patch
        # encode() to return the precomputed codes so only decoder-side
        # work is timed.
        from relationprediction_tpu.models.build import EncodeResult
        er = EncodeResult(codes, rel_codes)
        saved = model.encode
        model.encode = lambda *a, **k: er
        try:
            p2 = dict(params)
            p2["decoder"] = dp
            return model.loss_binomial_factored(
                p2, None, batch.triples, batch.mask, values_f, co_f,
                deterministic=True)
        finally:
            model.encode = saved

    timed("factored decoder fwd (frozen codes)",
          lambda p, acc: factored_dec_loss(
              enc_fixed.entity_codes + acc, enc_fixed.relation_codes,
              p["decoder"], acc) + acc * 0, params)
    timed("factored decoder fwd+bwd (frozen codes)",
          lambda p, acc: jax.grad(
              lambda c: factored_dec_loss(c, enc_fixed.relation_codes,
                                          p["decoder"], acc)
          )(enc_fixed.entity_codes + acc).sum() + acc * 0, params)

    # optimizer update alone (Adam over the full param tree)
    opt = build_optimizer(cfg.optimizer)
    opt_state = opt.init(params)
    grads = jax.grad(lambda q: model.loss(q, graph, triples, labels, mask,
                                          rng=key, deterministic=False)
                     )(params)

    def adam_only(g_, s_, acc):
        updates, s2 = opt.update(g_, s_, params)
        return jax.tree_util.tree_reduce(lambda a, b: a + b.sum(), updates,
                                         0.0) + acc * 0
    timed("optimizer update (Adam)", adam_only, grads, opt_state)

    # full train step (loss+grads+update), negative sampling on device
    def full_step(p, s_, acc):
        # Carry-folded key: keeps the per-step corruption draw INSIDE
        # the timing loop (0*acc is not provably 0 for floats, so LICM
        # cannot hoist it — round-5 review finding).
        kk = jax.random.fold_in(key, (acc * 0).astype(jnp.int32))
        if args.negative_mode == "binomial":
            t, y, m = device_negative_sample(batch.triples, batch.mask,
                                             rate, V, kk)
            loss, gr = jax.value_and_grad(
                lambda q: model.loss(q, graph, t, y, m, rng=key,
                                     deterministic=False))(p)
        elif args.negative_mode == "binomial_factored":
            # The engine's production binomial path: same objective as
            # "binomial" (same corruption draws), factored gathers.
            from relationprediction_tpu.training.device_sampling import (
                device_negative_parts)
            values, co = device_negative_parts(batch.triples, rate, V, kk)
            loss, gr = jax.value_and_grad(
                lambda q: model.loss_binomial_factored(
                    q, graph, batch.triples, batch.mask, values, co,
                    rng=key, deterministic=False))(p)
        elif args.negative_mode == "split":
            neg_s, neg_o = device_negative_entities_split(
                batch.triples, rate, V, kk)
            loss, gr = jax.value_and_grad(
                lambda q: model.loss_structured(
                    q, graph, batch.triples, batch.mask, neg_s, neg_o,
                    rng=key, deterministic=False))(p)
        else:
            pool = jax.random.randint(kk, (512,), 0, V, dtype=np.int32)
            loss, gr = jax.value_and_grad(
                lambda q: model.loss_shared_negatives(
                    q, graph, batch.triples, batch.mask, pool, rng=key,
                    deterministic=False))(p)
        updates, s2 = opt.update(gr, s_, p)
        # fold the updates into the return so DCE cannot delete the
        # backward + optimizer (round-3 harness bug: returning only
        # `loss` let XLA erase everything but the forward)
        upd_sum = jax.tree_util.tree_reduce(
            lambda a, b: a + b.sum(), updates, 0.0)
        return loss + upd_sum * 1e-30
    timed(f"FULL device step [{args.negative_mode}]", full_step, params,
          opt_state)


if __name__ == "__main__":
    main()
