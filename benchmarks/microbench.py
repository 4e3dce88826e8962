#!/usr/bin/env python
"""Component microbenchmarks for the relational SpMM pipeline.

Methodology notes for this environment (axon TPU tunnel):
  * every host->device call has ~28 ms transport latency, so ops are timed
    with an IN-GRAPH fori_loop (N repetitions chained by a data dependency)
    and one final scalar fetch;
  * compiles go through a remote-compile service (local AOT is blocked by a
    libtpu version mismatch) and can take minutes — the persistent
    compilation cache in /tmp/jaxcache amortizes across runs.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from relationprediction_tpu.graph import build_graph_batch
    from relationprediction_tpu.models import encoders as enc

    V, R, D, B, E, N = 14541, 237, 500, 100, 131072, 20
    rng = np.random.default_rng(0)
    rel_w = 1.0 / np.arange(1, R + 1)
    rel_w /= rel_w.sum()
    edges = np.stack([rng.integers(0, V, E),
                      rng.choice(R, size=E, p=rel_w),
                      rng.integers(0, V, E)], 1).astype(np.int32)
    feat = jnp.asarray(rng.standard_normal((V + 1, D)).astype(np.float32))
    msgs = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32))
    idx = jnp.asarray(edges[:, 2])
    w = jnp.asarray(rng.standard_normal((D, D)).astype(np.float32))

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
        print(f"{label:44s} compile {tc:6.1f}s  {dt * 1e3:8.3f} ms "
              f" {E / dt / 1e6:8.1f}M edges/s", flush=True)
        return dt

    timed("matmul [E,500]x[500,500]",
          lambda m, w, acc: ((m + acc) @ w).sum(), msgs, w)
    timed("gather [E,500] <- [V,500]",
          lambda f, i, acc: ((f + acc)[i]).sum(), feat, idx)
    timed("segment_sum [E,500] -> [V,500]",
          lambda m, i, acc: jax.ops.segment_sum(
              m + acc, i, num_segments=V + 1).sum(), msgs, idx)

    params = enc.init_gcn_layer(jax.random.PRNGKey(0), "block",
                                n_relations=R, d_in=D, d_out=D, n_bases=B)

    def layer_body(g):
        def body(params, feats, acc):
            out = enc.apply_gcn_layer(
                params, "block", g, feats + acc, n_bases=B,
                use_nonlinearity=True, dropout_keep=1.0, deterministic=True,
                rng=None, n_vertices=V)
            return out.sum()
        return body

    g_flat = build_graph_batch(edges, V, R, pad_to=E)
    g_buck = build_graph_batch(edges, V, R, bucket_size=64)
    timed("block layer (per-edge W gather)", layer_body(g_flat),
          params, feat[:V])
    timed("block layer (bucketed T=64)", layer_body(g_buck),
          params, feat[:V])

    # basis layer for comparison
    params_b = enc.init_gcn_layer(jax.random.PRNGKey(0), "basis",
                                  n_relations=R, d_in=D, d_out=D, n_bases=5)

    def basis_body(params, feats, acc):
        out = enc.apply_gcn_layer(
            params_b, "basis", g_flat, feats + acc, n_bases=5,
            use_nonlinearity=True, dropout_keep=1.0, deterministic=True,
            rng=None, n_vertices=V)
        return out.sum()
    timed("basis layer (B=5)", basis_body, params_b, feat[:V])


if __name__ == "__main__":
    main()
