#!/usr/bin/env python
"""Staircase-kernel parameter sweep on the TPU.

Isolates ops/staircase.py's pallas_call (no gather/transform) at the
flagship scale (E=131072, V=14541, d=500) across (rb, chunk, dtype) to
locate the per-grid-step overhead that layer_profile.py exposes: the full
layer costs ~2x8 ms more than its gather+transform+permute parts, all of it
inside the kernel. Measurement basis for docs/ROOFLINE.md.
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

    from relationprediction_tpu.ops import staircase as sc

    V, D = 14541, 500
    E = 131072
    rng = np.random.default_rng(0)
    targets = rng.integers(0, V, E).astype(np.int32)
    weights = rng.random(E).astype(np.float32) + 0.5
    msgs = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32))

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

    # XLA segment-sum baseline for comparison
    tgt_dev = jnp.asarray(targets)
    w_dev = jnp.asarray(weights)

    def seg(m, acc):
        out = jax.ops.segment_sum((m + acc) * w_dev[:, None], tgt_dev,
                                  num_segments=V + 1)
        return out.sum() * 0.0
    dt = timed(seg, msgs)
    print(f"segment_sum unsorted                  {dt*1e3:8.3f} ms  "
          f"({E/dt/1e6:6.2f} M edges/s)")

    for rb in (128, 256, 512):
        for chunk in (256, 512, 1024, 2048):
            for dtype in (None, jnp.bfloat16):
                try:
                    layout = sc.build_staircase_layout(
                        targets, weights, V, rb=rb, chunk=chunk)
                except Exception as e:
                    print(f"rb={rb} chunk={chunk}: layout failed: {e}")
                    continue
                slots = layout.perm.shape[0]

                def call(m, acc):
                    out = sc.staircase_aggregate(
                        m + acc, layout, V, False, dtype)
                    return out.sum() * 0.0
                try:
                    dt = timed(call, msgs)
                except Exception as e:
                    print(f"rb={rb} chunk={chunk} {dtype}: FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}")
                    continue
                tag = "bf16" if dtype is not None else "f32 "
                print(f"rb={rb:4d} chunk={chunk:5d} {tag} "
                      f"slots={slots:7d} chunks={layout.n_chunks:5d}  "
                      f"{dt*1e3:8.3f} ms  ({E/dt/1e6:6.2f} M edges/s)")


if __name__ == "__main__":
    main()
