#!/usr/bin/env python
"""Headline benchmark: relational SpMM throughput (edges/sec/chip).

Workload: one full block-diagonal R-GCN layer (settings/gcn_block.exp
shapes — d=500, 100 blocks of 5x5, FB15k-237 entity/relation counts,
Zipfian relation popularity) — per-edge relational transform in both
directions + degree-normalized aggregation + self-loop, the computation the
reference runs through ``tf.sparse_tensor_dense_matmul``
(``gcn_basis_concat.py:69-83``).

Timing methodology: this environment's TPU transport adds ~28 ms latency
per host->device call and its `block_until_ready` can return before the
device finishes, so the op is repeated N times INSIDE one executable
(data-dependency-chained fori_loop) with a single scalar fetch at the end.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the speedup over a reference-style implementation on the
same hardware (per-edge weight-stack gather, the direct translation of the
reference's edge-parallel formulation) — >1.0 means the TPU-native layout
beats a faithful port.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

N_ITERS = 20


def timed(fn, *args):
    import jax

    @jax.jit
    def f(*a):
        def it(k, acc):
            return acc + fn(*a, acc)
        return jax.lax.fori_loop(0, N_ITERS, it, 0.0)

    t0 = time.perf_counter()
    float(f(*args))  # compile + first run
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(*args))
    return (time.perf_counter() - t0) / N_ITERS, compile_s


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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

    def layer(graph):
        def body(params, feats, acc):
            out = enc.apply_gcn_layer(
                params, "block", graph, feats + acc, n_bases=B,
                use_nonlinearity=True, dropout_keep=1.0, deterministic=True,
                rng=None, n_vertices=V)
            return out.sum()
        return body

    g_bucketed = build_graph_batch(edges, V, R, bucket_size=64)
    g_flat = build_graph_batch(edges, V, R, pad_to=E)

    dt, c1 = timed(layer(g_bucketed), params, features)
    dt_base, c2 = timed(layer(g_flat), params, features)

    edges_per_sec = E / dt
    print(f"block R-GCN layer (TPU-native, bucketed): {dt * 1e3:.2f} ms "
          f"({edges_per_sec / 1e6:.2f}M edges/s, compile {c1:.0f}s); "
          f"reference-style per-edge gather: {dt_base * 1e3:.2f} ms "
          f"({E / dt_base / 1e6:.2f}M edges/s, compile {c2:.0f}s) on "
          f"{jax.devices()[0]}", file=sys.stderr)

    print(json.dumps({
        "metric": "relational_spmm_block_edges_per_sec_per_chip",
        "value": round(edges_per_sec, 1),
        "unit": "edges/s/chip",
        "vs_baseline": round(dt_base / dt, 3),
    }))


if __name__ == "__main__":
    main()
