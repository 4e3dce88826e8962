#!/usr/bin/env python
"""Compare per-edge message-computation variants on the TPU."""
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
    from relationprediction_tpu.ops import relblock

    V, R, D, E, N = 14541, 237, 500, 131072, 10
    rng = np.random.default_rng(0)
    rel_w = 1.0 / np.arange(1, R + 1)
    rel_w /= rel_w.sum()
    edges = np.stack([rng.integers(0, V, E),
                      rng.choice(R, size=E, p=rel_w),
                      rng.integers(0, V, E)], 1).astype(np.int32)
    feats = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))

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
        print(f"{label:46s} compile {tc:6.1f}s  {dt * 1e3:8.2f} ms",
              flush=True)

    # ---- block-diagonal variants (B=100, dr=5) ----
    B = 100
    g = build_graph_batch(edges, V, R, bucket_size=64)
    blocks = jnp.asarray(rng.standard_normal(
        (R, B, 5, 5)).astype(np.float32))

    timed("block bucketed einsum",
          lambda f_, acc: relblock.block_diag_messages_bucketed(
              f_ + acc, blocks, g.senders, g.bucket_rel, B,
              g.bucket_size).sum(), feats)
    timed("block bucketed unrolled VPU",
          lambda f_, acc: relblock.block_diag_messages_bucketed_unrolled(
              f_ + acc, blocks, g.senders, g.bucket_rel, B,
              g.bucket_size).sum(), feats)

    # ---- basis variants (B=5) ----
    Bb = 5
    g2 = build_graph_batch(edges, V, R, pad_to=E, sort_directions=True)
    w_basis = jnp.asarray(rng.standard_normal(
        (D, Bb * D)).astype(np.float32))
    coeffs = jnp.asarray(rng.standard_normal((R, Bb)).astype(np.float32))

    def vertex_hoisted(f_, acc):
        proj = relblock.basis_vertex_projection(f_ + acc, w_basis, Bb)
        return relblock.basis_messages(proj, coeffs, g2.senders,
                                       g2.relations).sum()

    def chunked(f_, acc):
        fg = (f_ + acc)[jnp.clip(g2.senders, 0, V - 1)]
        ec = coeffs[g2.relations]
        return relblock.basis_messages_chunked(fg, w_basis, ec, Bb).sum()

    timed("basis vertex-hoisted (gather [E,B*d])", vertex_hoisted, feats)
    timed("basis chunked (gather [E,d] + MXU)", chunked, feats)


if __name__ == "__main__":
    main()
