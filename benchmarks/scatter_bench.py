#!/usr/bin/env python
"""Design-space measurements for the aggregation path.

Questions:
  1. does indices_are_sorted help XLA's segment_sum on TPU?
  2. does bf16 halve the irregular-traffic time (gather + scatter)?
  3. merged two-direction ops (one [2E] gather / segment_sum) vs two [E]?
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

    V, D, E, N = 14541, 500, 131072, 20
    rng = np.random.default_rng(0)
    idx_u = jnp.asarray(rng.integers(0, V, E).astype(np.int32))
    idx_s = jnp.asarray(np.sort(np.asarray(idx_u)))
    idx2_s = jnp.asarray(np.sort(rng.integers(0, V, 2 * E)).astype(np.int32))
    msgs = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32))
    msgs2 = jnp.asarray(rng.standard_normal((2 * E, D)).astype(np.float32))
    table = jnp.asarray(rng.standard_normal((V + 1, D)).astype(np.float32))
    msgs_bf = msgs.astype(jnp.bfloat16)
    table_bf = table.astype(jnp.bfloat16)

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
        print(f"{label:46s} compile {tc:6.1f}s  {dt * 1e3:8.3f} ms",
              flush=True)
        return dt

    ss = jax.ops.segment_sum
    timed("segment_sum unsorted f32",
          lambda m, acc: ss(m + acc, idx_u, num_segments=V + 1).sum(), msgs)
    timed("segment_sum sorted f32",
          lambda m, acc: ss(m + acc, idx_s, num_segments=V + 1,
                            indices_are_sorted=True).sum(), msgs)
    timed("segment_sum sorted f32 [2E]",
          lambda m, acc: ss(m + acc, idx2_s, num_segments=V + 1,
                            indices_are_sorted=True).sum(), msgs2)
    timed("segment_sum sorted bf16 acc f32",
          lambda m, acc: ss((m + acc.astype(jnp.bfloat16)),
                            idx_s, num_segments=V + 1,
                            indices_are_sorted=True).astype(jnp.float32).sum(),
          msgs_bf)
    timed("gather f32",
          lambda t, acc: ((t + acc)[idx_u]).sum(), table)
    timed("gather bf16",
          lambda t, acc: ((t + acc.astype(jnp.bfloat16))[idx_u]
                          ).astype(jnp.float32).sum(), table_bf)
    timed("gather+weight+scatter sorted f32 (fused?)",
          lambda t, acc: ss((t + acc)[idx_u], idx_s, num_segments=V + 1,
                            indices_are_sorted=True).sum(), table)


if __name__ == "__main__":
    main()
