#!/usr/bin/env python
"""Staircase v2 production-module bench at flagship scale (TPU).

Measures ops/staircase2.py's fused block/basis direction aggregation and
the pure scatter mode against the v1 pipeline (bucketed transform +
permute + v1 kernel) on the bench.py workload (E=131072, V=14541, d=500,
Zipfian relations). One direction per measurement; a full layer runs two.
"""
from __future__ import annotations

import time

import numpy as np

N_ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from relationprediction_tpu.ops import staircase2 as s2

    V, R, D, B = 14541, 237, 500, 100
    DR = D // B
    E = 131072
    rng = np.random.default_rng(0)
    rel_w = 1.0 / np.arange(1, R + 1)
    rel_w /= rel_w.sum()
    senders = rng.integers(0, V, E).astype(np.int32)
    relations = rng.choice(R, size=E, p=rel_w).astype(np.int32)
    receivers = rng.integers(0, V, E).astype(np.int32)
    deg = np.bincount(receivers, minlength=V)
    weights = (1.0 / np.maximum(deg[receivers], 1)).astype(np.float32)

    feats = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    blocks = jnp.asarray(
        rng.standard_normal((R, B, DR, DR)).astype(np.float32))

    def timed(fn, *args):
        @jax.jit
        def f(*a):
            def it(k, acc):
                return acc + fn(*a, acc)
            return jax.lax.fori_loop(0, N_ITERS, it, 0.0)
        float(f(*args))
        t0 = time.perf_counter()
        float(f(*args))
        return (time.perf_counter() - t0) / N_ITERS

    for rb, chunk, k, grp in ((256, 512, None, 1), (512, 512, None, 1),
                              (512, 1024, None, 1), (256, 256, None, 1),
                              (1024, 512, None, 1)):
        pair = s2.build_staircase2_pair(
            senders, relations, receivers, weights, V, direction="forward",
            rb=rb, chunk=chunk, k=k, group=grp)
        lay = pair.fwd
        for dtype in (jnp.bfloat16, None):
            def run(f, w, acc):
                out = s2.block_direction(f + acc, w, pair, B, V, False,
                                         dtype)
                return out.sum() * 0.0
            tag = "bf16" if dtype is not None else "f32 "
            try:
                dt = timed(run, feats, blocks)
            except Exception as e:
                print(f"BLOCK rb={rb} C={chunk} T={grp} {tag}: FAILED "
                      f"{type(e).__name__}: {str(e)[:140]}")
                continue
            print(f"BLOCK rb={rb:4d} C={chunk:5d} k={lay.k} T={grp:3d} "
                  f"{tag} slots={lay.n_slots:7d} rows={lay.n_rows:4d} "
                  f"direct={int(lay.direct)}  {dt*1e3:8.3f} ms "
                  f"({E/dt/1e6:6.2f} M edges/s/dir)")

    # basis (gcn_basis.exp: n_bases=5)
    NB = 5
    w_flat = jnp.asarray(
        rng.standard_normal((D, NB * D)).astype(np.float32))
    coef = jnp.asarray(rng.standard_normal((R, NB)).astype(np.float32))
    pair_b = s2.build_staircase2_pair(
        senders, relations, receivers, weights, V, direction="forward",
        rb=256, chunk=512, group=1)
    for dtype in (jnp.bfloat16, None):
        def runb(f, w, c, acc):
            out = s2.basis_direction(f + acc, w, c, pair_b, NB, V, False,
                                     dtype)
            return out.sum() * 0.0
        tag = "bf16" if dtype is not None else "f32 "
        try:
            dt = timed(runb, feats, w_flat, coef)
        except Exception as e:
            print(f"BASIS {tag}: FAILED {type(e).__name__}: {str(e)[:140]}")
            continue
        print(f"BASIS rb=256 C=512 {tag} slots={pair_b.fwd.n_slots:7d}  "
              f"{dt*1e3:8.3f} ms ({E/dt/1e6:6.2f} M edges/s/dir)")

    # scatter-only mode (pre-computed messages, permute fused in take)
    msgs = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32))
    lay_s = s2.build_staircase2_layout(senders, relations, receivers,
                                       weights, V, rb=256, chunk=512,
                                       group=1)
    for dtype in (jnp.bfloat16, None):
        def runs(m, acc):
            out = s2.scatter2(m + acc, lay_s, V, False, dtype)
            return out.sum() * 0.0
        tag = "bf16" if dtype is not None else "f32 "
        dt = timed(runs, msgs)
        print(f"SCATTER rb=256 C=512 {tag} slots={lay_s.n_slots:7d}  "
              f"{dt*1e3:8.3f} ms ({E/dt/1e6:6.2f} M edges/s/dir)")


if __name__ == "__main__":
    main()
