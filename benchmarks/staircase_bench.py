#!/usr/bin/env python
"""Staircase SpMM kernel vs XLA segment_sum on the TPU.

FB15k-237-scale aggregation: [E=131072, 500] messages -> [V=14541, 500],
Zipf-weighted relation mix, 1/degree weights. Sweeps (rb, chunk) and
message dtype. Timing: fori_loop-chained executions, one scalar fetch.
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

    float(f(*args))
    t0 = time.perf_counter()
    float(f(*args))
    return (time.perf_counter() - t0) / N_ITERS


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from relationprediction_tpu.ops.staircase import (
        build_staircase_layout, staircase_aggregate, staircase_aggregate_xla)

    V, D, E = 14541, 500, 131072
    rng = np.random.default_rng(0)
    targets = np.sort(rng.integers(0, V, E)).astype(np.int32)
    deg = np.bincount(targets, minlength=V)
    weights = (1.0 / np.maximum(deg[targets], 1)).astype(np.float32)
    msgs = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32))

    # correctness on hardware first
    layout = build_staircase_layout(targets, weights, V, rb=128, chunk=256)
    out_k = np.asarray(staircase_aggregate(msgs, layout, V))
    out_x = np.asarray(staircase_aggregate_xla(msgs, layout, V))
    err = np.max(np.abs(out_k - out_x)) / max(np.max(np.abs(out_x)), 1e-9)
    print(f"hardware parity vs segment_sum: max rel err {err:.2e}")

    def seg(m, acc):
        return staircase_aggregate_xla(m + acc, layout, V).sum() * 0
    dt = timed(seg, msgs)
    print(f"XLA segment_sum(sorted)+weights        {dt*1e3:8.3f} ms "
          f"({E/dt/1e6:7.1f}M edges/s)")

    for rb, chunk in [(128, 256), (128, 512), (256, 256), (64, 256),
                      (128, 128)]:
        lo = build_staircase_layout(targets, weights, V, rb=rb, chunk=chunk)
        slots = lo.perm.shape[0]
        for dtype, tag in [(None, "f32"), (jnp.bfloat16, "bf16")]:
            def stair(m, acc, lo=lo, dtype=dtype):
                return staircase_aggregate(m + acc, lo, V, False,
                                           dtype).sum() * 0
            dt = timed(stair, msgs)
            print(f"staircase rb={rb:3d} C={chunk:3d} {tag:4s} "
                  f"(slots={slots})   {dt*1e3:8.3f} ms "
                  f"({E/dt/1e6:7.1f}M edges/s)")


if __name__ == "__main__":
    main()
