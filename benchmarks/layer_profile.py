#!/usr/bin/env python
"""Component-level profile of the block R-GCN layer hot path on the TPU.

Times each constituent op of the flagship block-diagonal layer
(E=131072, V=14541, d=500, B=100 — settings/gcn_block.exp at FB15k-237
scale) with the in-graph fori_loop methodology of bench.py, and prints a
bytes-based effective-bandwidth estimate per op. This is the measurement
basis for docs/ROOFLINE.md.
"""
from __future__ import annotations

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

    float(f(*args))  # compile
    t0 = time.perf_counter()
    float(f(*args))
    return (time.perf_counter() - t0) / N_ITERS


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    V, R, D, B = 14541, 237, 500, 100
    E = 131072
    DR = D // B
    rng = np.random.default_rng(0)

    rel_w = 1.0 / np.arange(1, R + 1) ** 1.0
    rel_w /= rel_w.sum()
    senders = jnp.asarray(rng.integers(0, V, E).astype(np.int32))
    relations_np = rng.choice(R, size=E, p=rel_w).astype(np.int32)
    receivers_np = rng.integers(0, V, E).astype(np.int32)
    receivers = jnp.asarray(receivers_np)
    receivers_sorted = jnp.asarray(np.sort(receivers_np))
    perm = jnp.asarray(rng.permutation(E).astype(np.int32))

    feats = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    msgs = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32))
    blocks = jnp.asarray(
        rng.standard_normal((R, B, DR, DR)).astype(np.float32))
    weights = jnp.asarray(rng.random(E).astype(np.float32))

    # bucketed layout (relation-major, bucket 64) for the transform
    bucket = 64
    order = np.argsort(relations_np, kind="stable")
    counts = np.bincount(relations_np, minlength=R)
    padded = -(-counts // bucket) * bucket
    eb = int(padded.sum())
    eb = -(-eb // 8192) * 8192
    b_vertices = np.zeros(eb, np.int32)
    b_rel = np.zeros(eb // bucket, np.int32)
    offs = np.zeros(R + 1, np.int64)
    np.cumsum(padded, out=offs[1:])
    run = np.zeros(R + 1, np.int64)
    np.cumsum(counts, out=run[1:])
    srt = relations_np[order]
    rank = np.arange(E) - run[srt]
    pos = offs[srt] + rank
    b_vertices[pos] = np.asarray(senders)[order]
    for r in range(R):
        b_rel[offs[r] // bucket:offs[r + 1] // bucket] = r
    b_vertices = jnp.asarray(b_vertices)
    b_rel = jnp.asarray(b_rel)
    msgs_b = jnp.asarray(rng.standard_normal((eb, D)).astype(np.float32))

    from relationprediction_tpu.ops import relblock

    results = {}

    def rep(name, dt, gb):
        results[name] = dt
        print(f"{name:42s} {dt * 1e3:8.3f} ms   "
              f"{gb / dt:7.1f} GB/s eff  ({gb * 1e3:.0f} MB)")

    # 1. row gather [E, 500] <- [V, 500]
    gb = (E * D * 4 * 2) / 1e9  # read gathered rows + write out
    rep("gather feats[idx] [E,500]",
        timed(lambda f, i, acc: (f[i] + acc).sum() * 0, feats, senders), gb)

    # 2. bucketed block transform (einsum, current production path)
    def tr_einsum(f, acc):
        y = relblock.block_diag_messages_bucketed(
            f + acc, blocks, b_vertices, b_rel, B, bucket)
        return y.sum() * 0
    gb = (eb * D * 4 * 3) / 1e9  # gather read+write + write y (approx)
    rep("block transform bucketed (einsum)", timed(tr_einsum, feats), gb)

    # 3. bucketed block transform (VPU unrolled)
    def tr_unroll(f, acc):
        y = relblock.block_diag_messages_bucketed_unrolled(
            f + acc, blocks, b_vertices, b_rel, B, bucket)
        return y.sum() * 0
    rep("block transform bucketed (unrolled)", timed(tr_unroll, feats), gb)

    # 4. segment_sum unsorted
    def seg_unsorted(m, w, acc):
        out = jax.ops.segment_sum((m + acc) * w[:, None], receivers,
                                  num_segments=V + 1)
        return out.sum() * 0
    gb = (E * D * 4 * 2 + V * D * 4) / 1e9
    rep("segment_sum unsorted [E,500]->[V,500]",
        timed(seg_unsorted, msgs, weights), gb)

    # 5. segment_sum sorted
    def seg_sorted(m, w, acc):
        out = jax.ops.segment_sum((m + acc) * w[:, None], receivers_sorted,
                                  num_segments=V + 1, indices_are_sorted=True)
        return out.sum() * 0
    rep("segment_sum sorted   [E,500]->[V,500]",
        timed(seg_sorted, msgs, weights), gb)

    # 6. row permutation y[perm]
    gb = (E * D * 4 * 2) / 1e9
    rep("row permute msgs[perm] [E,500]",
        timed(lambda m, p, acc: (m[p] + acc).sum() * 0, msgs, perm), gb)

    # 7. full current layer (bucketed)
    from relationprediction_tpu.graph import build_graph_batch
    from relationprediction_tpu.models import encoders as enc
    edges = np.stack([np.asarray(senders), relations_np, receivers_np],
                     axis=1).astype(np.int32)
    g_bucketed = build_graph_batch(edges, V, R, bucket_size=64)
    params = enc.init_gcn_layer(jax.random.PRNGKey(0), "block",
                                n_relations=R, d_in=D, d_out=D, n_bases=B)

    def layer(p, f, acc):
        out = enc.apply_gcn_layer(
            p, "block", g_bucketed, f + acc, n_bases=B,
            use_nonlinearity=True, dropout_keep=1.0, deterministic=True,
            rng=None, n_vertices=V)
        return out.sum() * 0
    gb = 4 * (E * D * 4 * 2) / 1e9
    rep("FULL block layer (current, bucketed)", timed(layer, params, feats),
        gb)

    print({k: round(v * 1e3, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
