#!/usr/bin/env python
"""Prototype bench for staircase kernel redesigns (pre-production).

Hypothesis from staircase_params_bench.py: the round-2 kernel spends ~6us
per grid step independent of tile shape — the scalar-prefetch-indexed
output BlockSpec defeats Mosaic's pipelining. Candidates:

  A. static rectangular grid (row_block, chunk_within_block): pure index
     maps, output revisited across the inner dim (standard matmul-accum
     pattern), zero-init at j==0. Requires uniform chunks per block
     (padding).
  B. grid over chunks with a VMEM accumulator scratch + manual async-copy
     flush to an HBM output when the row block changes. Input stream stays
     auto-pipelined with a static index map; no output BlockSpec at all.

Also measures a dense-stream roofline point (copy bandwidth) for
docs/ROOFLINE.md.
"""
from __future__ import annotations

import time

import numpy as np

N_ITERS = 20


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    V, D = 14541, 500
    E = 131072
    rng = np.random.default_rng(0)
    targets_np = np.sort(rng.integers(0, V, E).astype(np.int32))
    weights_np = (rng.random(E) + 0.5).astype(np.float32)

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

    # --- roofline points ---------------------------------------------------
    big = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32))
    big2 = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32))

    def stream(a, b, acc):
        return ((a + acc) * b).sum() * 0.0  # read 2 streams
    dt = timed(stream, big, big2)
    gb = 2 * E * D * 4 / 1e9
    print(f"dense stream 2x[E,500] f32 read       {dt*1e3:8.3f} ms  "
          f"{gb/dt:7.1f} GB/s")

    bigh = big.astype(jnp.bfloat16)
    big2h = big2.astype(jnp.bfloat16)

    def streamh(a, b, acc):
        return ((a + acc.astype(jnp.bfloat16)) * b).astype(jnp.float32).sum() * 0.0
    dt = timed(streamh, bigh, big2h)
    gb = 2 * E * D * 2 / 1e9
    print(f"dense stream 2x[E,500] bf16 read      {dt*1e3:8.3f} ms  "
          f"{gb/dt:7.1f} GB/s")

    # --- build a uniform (block, chunk) layout for design A ----------------
    for rb, C in ((512, 512), (256, 512), (512, 1024), (128, 512)):
        n_blocks = -(-V // rb)
        v_pad = n_blocks * rb
        blocks = targets_np // rb
        cnt = np.bincount(blocks, minlength=n_blocks)
        max_chunks = int(np.maximum(-(-cnt // C), 1).max())
        slots_per_block = max_chunks * C
        S = n_blocks * slots_per_block

        lrows = np.full(S, rb, np.int32)
        wts = np.zeros(S, np.float32)
        # place each block's edges at its slot run start
        off = np.zeros(n_blocks + 1, np.int64)
        np.cumsum(cnt, out=off[1:])
        for b in range(n_blocks):
            k = cnt[b]
            base = b * slots_per_block
            lrows[base:base + k] = targets_np[off[b]:off[b + 1]] - b * rb
            wts[base:base + k] = weights_np[off[b]:off[b + 1]]
        lrows = lrows.reshape(n_blocks, max_chunks, 1, C)
        wts_dev = jnp.asarray(wts)

        msgs_sc = jnp.asarray(
            rng.standard_normal((S, D)).astype(np.float32))

        for dtype in (jnp.float32, jnp.bfloat16):
            m = (msgs_sc * wts_dev[:, None]).astype(dtype)
            lrows_dev = jnp.asarray(lrows)

            def kernel(rows_ref, msgs_ref, out_ref):
                j = pl.program_id(1)

                @pl.when(j == 0)
                def _():
                    out_ref[...] = jnp.zeros_like(out_ref)

                rows = rows_ref[0, 0, 0, :]
                row_ids = jax.lax.broadcasted_iota(
                    jnp.int32, (rb, C), 0)
                onehot = (row_ids == rows[None, :]).astype(msgs_ref.dtype)
                out_ref[...] += jnp.dot(
                    onehot, msgs_ref[...],
                    preferred_element_type=jnp.float32)

            grid_spec = pl.GridSpec(
                grid=(n_blocks, max_chunks),
                in_specs=[
                    pl.BlockSpec((1, 1, 1, C), lambda i, j: (i, j, 0, 0)),
                    pl.BlockSpec(
                        (C, D),
                        lambda i, j: (i * max_chunks + j, 0)),
                ],
                out_specs=pl.BlockSpec((rb, D), lambda i, j: (i, 0)),
            )
            call = pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((v_pad, D), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
            )

            def agg(mm, acc):
                out = call(lrows_dev, mm + acc.astype(mm.dtype))
                return out.astype(jnp.float32).sum() * 0.0

            try:
                dt = timed(agg, m)
            except Exception as e:
                print(f"A rb={rb} C={C} {dtype.__name__}: FAILED "
                      f"{type(e).__name__}: {str(e)[:100]}")
                continue
            itemsz = 2 if dtype == jnp.bfloat16 else 4
            gb = (S * D * itemsz + v_pad * D * 4) / 1e9
            print(f"A rb={rb:4d} C={C:5d} {dtype.__name__:8s} "
                  f"slots={S:7d} grid=({n_blocks},{max_chunks})  "
                  f"{dt*1e3:8.3f} ms  {gb/dt:6.1f} GB/s  "
                  f"({E/dt/1e6:6.2f} M edges/s)")


if __name__ == "__main__":
    main()
