#!/usr/bin/env python
"""Split costs of the staircase aggregation on TPU: permute gather vs
kernel vs matmul, plus a pure-streaming calibration kernel and a bf16
transform. Informs docs/ROOFLINE.md."""
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from relationprediction_tpu.ops.staircase import (
        build_staircase_layout, _staircase_call)

    V, D, E = 14541, 500, 131072
    rng = np.random.default_rng(0)
    targets = np.sort(rng.integers(0, V, E)).astype(np.int32)
    deg = np.bincount(targets, minlength=V)
    weights = (1.0 / np.maximum(deg[targets], 1)).astype(np.float32)
    msgs = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32))

    for chunk in (256, 512):
        lo = build_staircase_layout(targets, weights, V, rb=128, chunk=chunk)
        slots = lo.perm.shape[0]
        mb = slots * D * 4 / 1e6

        def permute(m, acc):
            out = jnp.take(m + acc, lo.perm % m.shape[0], axis=0) \
                * lo.weights.reshape(-1)[:, None]
            return out.sum() * 0
        dt = timed(permute, msgs)
        print(f"C={chunk} permute+weight f32 ({mb:.0f}MB out)  "
              f"{dt*1e3:8.3f} ms  {2*mb/1e3/dt:6.0f} GB/s")

        def permute_bf16(m, acc):
            out = (jnp.take(m + acc, lo.perm % m.shape[0], axis=0)
                   * lo.weights.reshape(-1)[:, None]).astype(jnp.bfloat16)
            return out.astype(jnp.float32).sum() * 0
        dt = timed(permute_bf16, msgs)
        print(f"C={chunk} permute+weight bf16                 "
              f"{dt*1e3:8.3f} ms")

        msgs_sc = jnp.asarray(
            rng.standard_normal((slots, D)).astype(np.float32))
        for dt_tag, m_in in (("f32", msgs_sc),
                             ("bf16", msgs_sc.astype(jnp.bfloat16))):
            def kernel_only(m, acc):
                out = _staircase_call(
                    m + jnp.asarray(acc, m.dtype), lo, False)
                return out.sum() * 0
            dt = timed(kernel_only, m_in)
            bytes_moved = (slots * D * m_in.dtype.itemsize
                           + lo.v_pad * D * 4)
            print(f"C={chunk} kernel-only {dt_tag:4s}                     "
                  f"{dt*1e3:8.3f} ms  {bytes_moved/1e9/dt:6.0f} GB/s "
                  f"({E/dt/1e6:6.1f}M e/s)")

    # streaming calibration: same grid/block structure, no matmul
    lo = build_staircase_layout(targets, weights, V, rb=128, chunk=256)
    slots = lo.perm.shape[0]
    n_chunks = lo.n_chunks

    def _copy_kernel(rb_ref, m_ref, o_ref):
        c = pl.program_id(0)
        prev = rb_ref[jnp.maximum(c - 1, 0)]
        first = (c == 0) | (rb_ref[c] != prev)

        @pl.when(first)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
        o_ref[...] += m_ref[0:128, :]

    def stream_only(m, acc):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[pl.BlockSpec((256, D), lambda i, r: (i, 0))],
            out_specs=pl.BlockSpec((128, D), lambda i, r: (r[i], 0)),
        )
        out = pl.pallas_call(
            _copy_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((lo.v_pad, D), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(lo.chunk_rb, m + acc)
        return out.sum() * 0

    msgs_sc = jnp.asarray(rng.standard_normal((slots, D)).astype(np.float32))
    dt = timed(stream_only, msgs_sc)
    print(f"stream-calibration kernel (no matmul)       {dt*1e3:8.3f} ms  "
          f"{slots*D*4/1e9/dt:6.0f} GB/s")

    # bf16 bucketed transform
    from relationprediction_tpu.ops import relblock
    R, B = 237, 100
    rel_w = 1.0 / np.arange(1, R + 1); rel_w /= rel_w.sum()
    relations_np = rng.choice(R, size=E, p=rel_w).astype(np.int32)
    bucket = 64
    order = np.argsort(relations_np, kind="stable")
    counts = np.bincount(relations_np, minlength=R)
    padded = -(-counts // bucket) * bucket
    eb = -(-int(padded.sum()) // 8192) * 8192
    b_vertices = np.zeros(eb, np.int32)
    b_rel = np.zeros(eb // bucket, np.int32)
    offs = np.zeros(R + 1, np.int64); np.cumsum(padded, out=offs[1:])
    run = np.zeros(R + 1, np.int64); np.cumsum(counts, out=run[1:])
    srt = relations_np[order]
    pos = offs[srt] + (np.arange(E) - run[srt])
    b_vertices[pos] = rng.integers(0, V, E)
    for r in range(R):
        b_rel[offs[r] // bucket:offs[r + 1] // bucket] = r
    b_vertices = jnp.asarray(b_vertices); b_rel = jnp.asarray(b_rel)
    feats = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    blocks = jnp.asarray(rng.standard_normal((R, B, 5, 5)).astype(np.float32))

    def tr_f32(f, acc):
        y = relblock.block_diag_messages_bucketed(
            f + acc, blocks, b_vertices, b_rel, B, bucket)
        return y.sum() * 0
    print(f"bucketed transform f32                      "
          f"{timed(tr_f32, feats)*1e3:8.3f} ms")

    blocks16 = blocks.astype(jnp.bfloat16)

    def tr_bf16(f, acc):
        y = relblock.block_diag_messages_bucketed(
            (f + acc).astype(jnp.bfloat16), blocks16, b_vertices, b_rel,
            B, bucket)
        return y.astype(jnp.float32).sum() * 0
    print(f"bucketed transform bf16                     "
          f"{timed(tr_bf16, feats)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
