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

    n = 64 * 1024 * 1024  # 256 MB f32
    x = jnp.zeros((n,), jnp.float32)
    dt = timed(lambda x, acc: (x + (1.0 + acc)).sum() * 0, x)
    gb = n * 4 * 2 / 1e9
    print(f"stream add (read+write {gb * 1e3:.0f} MB): {dt * 1e3:.3f} ms "
          f"= {gb / dt:.1f} GB/s")

    # contiguous row gather (sorted indices): upper bound for gathers
    v, d = 14541, 500
    t = jnp.zeros((v, d), jnp.float32)
    idx_np = np.sort(np.random.default_rng(0).integers(0, v, 145920))
    idx = jnp.asarray(idx_np.astype(np.int32))
    dt = timed(lambda t, i, acc: (t[i] + acc).sum() * 0, t, idx)
    gb = len(idx_np) * d * 4 * 2 / 1e9
    print(f"row gather sorted [{len(idx_np)}x{d}]: {dt * 1e3:.3f} ms "
          f"= {gb / dt:.1f} GB/s")

    for dtype, name in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
        m = 4096
        a = jnp.zeros((m, m), dtype)
        b = jnp.zeros((m, m), dtype)
        dt = timed(lambda a, b, acc: jnp.dot(
            a + jnp.asarray(acc, dtype), b,
            preferred_element_type=jnp.float32).sum() * 0, a, b)
        fl = 2 * m ** 3 / 1e12
        print(f"GEMM {m}^3 {name}: {dt * 1e3:.3f} ms = {fl / dt:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
