#!/usr/bin/env python
"""Component-level profile of the block R-GCN layer hot path on the TPU.

Times each constituent op of the flagship block-diagonal layer
(E=131072, V=14541, d=500, B=100 — settings/gcn_block.exp at FB15k-237
scale) with the in-graph fori_loop methodology of bench.py, and prints a
bytes-based effective-bandwidth estimate per op. This is the measurement
basis for docs/ROOFLINE.md.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ITERS = 20


def timed(fn, *args):
    """Differenced in-graph timing — cancels the tunnel's ~25 ms fixed
    dispatch cost (see bench.py:timed for the full story)."""
    import jax

    def build(iters):
        @jax.jit
        def f(*a):
            def it(k, acc):
                return acc + fn(*a, acc)
            return jax.lax.fori_loop(0, iters, it, 0.0)
        return f

    f1, f2 = build(N_ITERS), build(N_ITERS * 5)
    float(f1(*args))  # compile
    float(f2(*args))

    def wall(f):
        t0 = time.perf_counter()
        float(f(*args))
        return time.perf_counter() - t0
    t1 = min(wall(f1) for _ in range(2))
    t2 = min(wall(f2) for _ in range(2))
    return (t2 - t1) / (N_ITERS * 4)


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

    # 1. row gather [E, 500] <- [V, 500]  (perturb f BEFORE the gather —
    # `f[i] + acc` lets XLA hoist the gather out of the timing loop)
    gb = (E * D * 4 * 2) / 1e9  # read gathered rows + write out
    rep("gather feats[idx] [E,500]",
        timed(lambda f, i, acc: ((f + acc)[i]).sum() * 0, feats, senders),
        gb)

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

    # 6. row permutation y[perm] (perturb before the permute, see stage 1)
    gb = (E * D * 4 * 2) / 1e9
    rep("row permute msgs[perm] [E,500]",
        timed(lambda m, p, acc: ((m + acc)[p]).sum() * 0, msgs, perm), gb)

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

    # ------------------------------------------------------------------
    # Fused v2 path (ops/staircase2.py) stage breakdown
    # ------------------------------------------------------------------
    from relationprediction_tpu.ops import staircase2 as s2

    print("\n--- fused v2 (staircase2) stages, block mode, bf16 ---")
    g2 = build_graph_batch(edges, V, R, staircase2=True)
    pair = g2.sc2_fwd
    layout = pair.fwd
    S = layout.n_slots
    n_rows = layout.n_rows
    rb, d = layout.rb, D
    print(f"slots S={S} (E={E}, pad {S / E - 1:+.1%}), grid rows={n_rows}, "
          f"blocks={layout.n_blocks}, k={layout.k}, chunk={layout.chunk}, "
          f"direct={layout.direct}")

    blocks_j = s2.blocks_to_jmajor(blocks).astype(jnp.bfloat16)
    feats_j = s2.to_jmajor(feats, B)
    x_sc = (jnp.take(feats_j, layout.sources, axis=0)
            * layout.weights[:, None]).astype(jnp.bfloat16)
    slot_rel = layout.slot_rel()

    # a. j-major lane permute of the vertex table
    gb = (V * D * 4 * 2) / 1e9
    rep("v2.a jmajor permute [V,500]",
        timed(lambda f, acc: s2.to_jmajor(f + acc, B).sum() * 0, feats), gb)

    # b. slot gather + weight + bf16 cast: [S,500] bf16 out of [V,500] f32
    def gather_cast(f, acc):
        x = (jnp.take(s2.to_jmajor(f + acc, B), layout.sources, axis=0)
             * layout.weights[:, None]).astype(jnp.bfloat16)
        return x.sum().astype(jnp.float32) * 0
    gb = (S * D * (4 + 2)) / 1e9  # read f32 rows (cache-ideal), write bf16
    rep("v2.b slot gather+w+cast -> [S,500]bf16", timed(gather_cast, feats),
        gb)

    # c. kernel only: fused transform + one-hot scatter on pre-gathered
    #    bf16 slots (the Pallas pass itself)
    def kernel_only(x, acc):
        out = s2._call_block(x + acc.astype(x.dtype), blocks_j, slot_rel,
                             layout, False)
        return out.sum() * 0
    gb = (S * D * 2 + n_rows * rb * D * 4) / 1e9
    rep("v2.c fused kernel [S,500]->[rows*256,500]",
        timed(kernel_only, x_sc), gb)

    # d. finishing segment-sum over grid rows
    out_rows = jnp.zeros((n_rows * rb, D), jnp.float32)
    def finish(o, acc):
        return s2._finish(o + acc, layout, V).sum() * 0
    gb = (n_rows * rb * D * 4 + V * D * 4) / 1e9
    rep("v2.d finish rows->[V,500]", timed(finish, out_rows), gb)

    # e. one full fused direction (a+b+c+d composed, incl. from_jmajor)
    def direction(f, w, acc):
        out = s2.block_direction(f + acc, w, pair, B, V, False, jnp.bfloat16)
        return out.sum() * 0
    gb = (V * D * 4 * 2 + S * D * (4 + 2) + S * D * 2
          + n_rows * rb * D * 4 * 2 + V * D * 4 * 2) / 1e9
    rep("v2.e full fused direction", timed(direction, feats,
                                           jnp.asarray(blocks)), gb)

    # f. full fused layer (both directions + self-loop, production path)
    def layer2(p, f, acc):
        out = enc.apply_gcn_layer(
            p, "block", g2, f + acc, n_bases=B, use_nonlinearity=True,
            dropout_keep=1.0, deterministic=True, rng=None, n_vertices=V,
            agg_dtype=jnp.bfloat16)
        return out.sum() * 0
    gb = 2 * (V * D * 4 * 4 + S * D * (4 + 2 + 2)
              + n_rows * rb * D * 4 * 2) / 1e9
    rep("v2.f FULL fused layer (prod, bf16)", timed(layer2, params, feats),
        gb)

    edges_per_s = E / results["v2.f FULL fused layer (prod, bf16)"]
    print(f"\nfused layer edges/s: {edges_per_s / 1e6:.2f}M")
    print({k: round(v * 1e3, 3) for k, v in results.items()
           if k.startswith("v2.")})


if __name__ == "__main__":
    main()
