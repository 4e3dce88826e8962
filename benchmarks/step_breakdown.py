#!/usr/bin/env python
"""Break the gcn_block train step into stages and time each on the TPU."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from relationprediction_tpu import config as config_lib
    from relationprediction_tpu.data import synthetic
    from relationprediction_tpu.models import build_model
    from relationprediction_tpu.training import BatchPipeline
    from relationprediction_tpu.training.device_sampling import (
        device_negative_sample)

    ds = synthetic.like("FB15k-237", seed=0)
    cfg = config_lib.load(os.path.join(os.path.dirname(__file__), "..",
                                       "settings", "gcn_block.exp"))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    pipe = BatchPipeline(model, cfg, ds, np.random.default_rng(0),
                         sampler="uniform", device_negatives=True)
    batch = pipe.next()
    rate = cfg.training.negative_sample_rate
    V = cfg.entity_count
    N = 10

    def timed(label, body, *args):
        @jax.jit
        def f(*a):
            def it(k, acc):
                return acc + body(*a, acc)
            return jax.lax.fori_loop(0, N, it, 0.0)
        t0 = time.perf_counter()
        float(f(*args))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f(*args))
        dt = (time.perf_counter() - t0) / N
        print(f"{label:40s} compile {tc:6.1f}s  {dt * 1e3:8.2f} ms",
              flush=True)

    key = jax.random.PRNGKey(0)
    triples, labels, mask = device_negative_sample(
        batch.triples, batch.mask, rate, V, key)

    def loss_from(p, enc_result, acc):
        e1 = enc_result.entity_codes[triples[:, 0]]
        r = enc_result.relation_codes[triples[:, 1]]
        e2 = enc_result.entity_codes[triples[:, 2]]
        en = model.decoder.energies(p["decoder"], e1, r, e2)
        from relationprediction_tpu.models.decoders import weighted_ce_loss
        return weighted_ce_loss(en, labels, mask)

    timed("encoder fwd (2 block layers)",
          lambda p, acc: model.encode(
              p, batch.graph, deterministic=True,
              rng=key).entity_codes.sum() + acc * 0, params)
    timed("full loss fwd",
          lambda p, acc: model.loss(
              p, batch.graph, triples, labels, mask, rng=key,
              deterministic=True) + acc * 0, params)
    timed("decoder-only fwd (precomputed codes)",
          lambda p, acc: loss_from(
              p, model.encode(p, batch.graph, deterministic=True, rng=key),
              acc) + acc * 0, params)
    timed("loss fwd+bwd (grads)",
          lambda p, acc: jax.tree_util.tree_reduce(
              lambda a, b: a + b.sum(),
              jax.grad(lambda q: model.loss(q, batch.graph, triples, labels,
                                            mask, rng=key,
                                            deterministic=False))(p),
              0.0) + acc * 0, params)
    # encoder-only grads (loss = sum of codes) isolates encoder backward
    timed("encoder fwd+bwd only",
          lambda p, acc: jax.tree_util.tree_reduce(
              lambda a, b: a + b.sum(),
              jax.grad(lambda q: model.encode(
                  q, batch.graph, deterministic=True,
                  rng=key).entity_codes.sum())(p), 0.0) + acc * 0, params)


if __name__ == "__main__":
    main()
