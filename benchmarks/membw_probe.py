#!/usr/bin/env python
"""Measure this chip's practical HBM streaming bandwidth and MXU matmul
throughput — the roofline ceilings docs/ROOFLINE.md quotes.

Streaming: y = x + 1 over a 256 MB f32 array (read + write, perfectly
coalescible). Matmul: 4096^3 bf16 GEMM. Both timed with the in-graph
fori_loop methodology (bench.py) to exclude host transport.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"device: {jax.devices()[0]}")

    def timed_arr(fn, acc0, *args):
        # array accumulator: forces each iteration's output to materialize
        @jax.jit
        def f(acc, *a):
            def it(k, acc):
                return fn(acc, *a)
            return jax.lax.fori_loop(0, N_ITERS, it, acc).sum()
        float(f(acc0, *args))
        t0 = time.perf_counter()
        float(f(acc0, *args))
        return (time.perf_counter() - t0) / N_ITERS

    n = 64 * 1024 * 1024  # 256 MB f32
    x = jnp.ones((n,), jnp.float32)
    dt = timed_arr(lambda acc, x: acc + x, jnp.zeros((n,), jnp.float32), x)
    gb = n * 4 * 3 / 1e9  # read x + read acc + write acc
    print(f"stream acc+=x (r/w {gb * 1e3:.0f} MB): {dt * 1e3:.3f} ms "
          f"= {gb / dt:.1f} GB/s")

    # contiguous row gather (sorted indices): upper bound for gathers
    v, d = 14541, 500
    t = jnp.ones((v, d), jnp.float32)
    idx_np = np.sort(np.random.default_rng(0).integers(0, v, 145920))
    idx = jnp.asarray(idx_np.astype(np.int32))
    dt = timed_arr(lambda acc, t, i: acc + t[i],
                   jnp.zeros((len(idx_np), d), jnp.float32), t, idx)
    gb = len(idx_np) * d * 4 * 3 / 1e9
    print(f"row gather sorted [{len(idx_np)}x{d}] (r/w {gb*1e3:.0f} MB): "
          f"{dt * 1e3:.3f} ms = {gb / dt:.1f} GB/s")

    # random-row gather at the staircase2 slot scale (the production
    # access pattern: 2 KB rows in arbitrary order)
    ridx = jnp.asarray(np.random.default_rng(1).permutation(
        np.repeat(np.arange(v), -(-len(idx_np) // v))[:len(idx_np)])
        .astype(np.int32))
    dt = timed_arr(lambda acc, t, i: acc + t[i],
                   jnp.zeros((len(idx_np), d), jnp.float32), t, ridx)
    print(f"row gather random [{len(idx_np)}x{d}] (r/w {gb*1e3:.0f} MB): "
          f"{dt * 1e3:.3f} ms = {gb / dt:.1f} GB/s")

    for dtype, name in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
        m, k = 4096, 16384
        a = jnp.ones((m, k), dtype)
        b = jnp.ones((k, m), dtype)

        def gemm(acc, a, b):
            # tie `a` to acc so the dot cannot be hoisted out of the loop
            a2 = a * (1 + acc[0, 0]).astype(dtype)
            return acc + jnp.dot(a2, b,
                                 preferred_element_type=jnp.float32)
        dt = timed_arr(gemm, jnp.zeros((m, m), jnp.float32), a, b)
        fl = 2 * m * m * k / 1e12
        print(f"GEMM {m}x{k}x{m} {name}: {dt * 1e3:.3f} ms "
              f"= {fl / dt:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
