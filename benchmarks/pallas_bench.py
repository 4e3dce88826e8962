#!/usr/bin/env python
"""Benchmark Pallas gather/SpMM kernels vs XLA on the TPU."""
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

    from relationprediction_tpu.ops import pallas_gather as pg

    V, D, E, N = 14541, 500, 131072, 20
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, E).astype(np.int32))
    msgs = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32))

    targets = np.sort(rng.integers(0, V, E)).astype(np.int32)
    n_rows = -(-V // 8) * 8
    row_ptr = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(np.bincount(targets, minlength=n_rows), out=row_ptr[1:])
    row_ptr_j = jnp.asarray(row_ptr)
    perm = jnp.asarray(rng.permutation(E).astype(np.int32))

    def timed(label, body, *args, bytes_moved=None):
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
        bw = f"  {bytes_moved / dt / 1e9:7.1f} GB/s" if bytes_moved else ""
        print(f"{label:44s} compile {tc:6.1f}s  {dt * 1e3:8.3f} ms{bw}",
              flush=True)
        return dt

    gbytes = E * D * 4 * 2  # read + write

    timed("XLA gather [E,500]",
          lambda t, i, acc: ((t + acc)[i]).sum(), table, idx,
          bytes_moved=gbytes)
    timed("pallas gather_rows blk=512",
          lambda t, i, acc: pg.gather_rows(t + acc, i).sum(), table, idx,
          bytes_moved=gbytes)
    timed("XLA segment_sum (pre-sorted ids)",
          lambda m, acc: jax.ops.segment_sum(
              m + acc, jnp.asarray(targets), num_segments=n_rows,
              indices_are_sorted=True).sum(), msgs,
          bytes_moved=gbytes)
    timed("pallas sorted_segment_sum (perm=shuffled)",
          lambda m, acc: pg.sorted_segment_sum(
              m + acc, perm, row_ptr_j, n_rows=n_rows).sum(), msgs,
          bytes_moved=gbytes)


if __name__ == "__main__":
    main()
