#!/usr/bin/env python
"""Measure formulations of the negative-code cotangent accumulation —
the [300k, 500] bf16 -> [V, 500] scatter-add that dominates the factored
decoder backward (7.7 ms of the 20.5 ms stage; benchmarks/decoder_trace.py).

Variants (traced indices, differenced timing):
  sorted-ss-bf16   sort + permute + segment_sum bf16 (round-4 production)
  sorted-ss-f32    same but accumulate in f32, cast back at the end
  scatter-bf16     plain .at[rows].add on bf16
  scatter-f32      plain .at[rows].add with f32 accumulation
  unsorted-ss-f32  segment_sum f32 without the pre-sort
  onehot-mm        sorted ids -> per-chunk one-hot MXU matmul into [V,d]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N1, N2 = 20, 100
V, D, N = 14541, 500, 300000


def diff_time(build, *args):
    f1, f2 = build(N1), build(N2)
    float(f1(*args))
    float(f2(*args))

    def wall(f):
        t0 = time.perf_counter()
        float(f(*args))
        return time.perf_counter() - t0
    t1 = min(wall(f1) for _ in range(2))
    t2 = min(wall(f2) for _ in range(2))
    return (t2 - t1) / (N2 - N1)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"device: {jax.devices()[0]}  N={N} rows d={D} V={V}")

    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    rows = jnp.asarray(rng.integers(0, V, N).astype(np.int32))

    def report(name, dt):
        gb = N * D * 2 / 1e9  # the cotangent stream read (payload)
        print(f"{name:<18s} {dt * 1e3:8.3f} ms   ({gb / dt:6.1f} GB/s of "
              f"cotangent payload)")

    def mk(body):
        def build(iters):
            @jax.jit
            def f(g, rows):
                def it(k, acc):
                    out = body(g * (1 + acc * 1e-30).astype(g.dtype),
                               rows)
                    return acc + out[0, 0].astype(jnp.float32)
                return jax.lax.fori_loop(0, iters, it, jnp.float32(0.0))
            return lambda: f(g, rows)
        return build

    def sorted_ss(gg, rr, acc_dtype):
        order = jnp.argsort(rr)
        d = jax.ops.segment_sum(
            jnp.take(gg, order, axis=0).astype(acc_dtype),
            jnp.take(rr, order), num_segments=V,
            indices_are_sorted=True)
        return d.astype(gg.dtype)

    report("sorted-ss-bf16",
           diff_time(mk(lambda gg, rr: sorted_ss(gg, rr, jnp.bfloat16))))
    report("sorted-ss-f32",
           diff_time(mk(lambda gg, rr: sorted_ss(gg, rr, jnp.float32))))
    report("scatter-bf16", diff_time(mk(
        lambda gg, rr: jnp.zeros((V, D), jnp.bfloat16).at[rr].add(gg))))
    report("scatter-f32", diff_time(mk(
        lambda gg, rr: jnp.zeros((V, D), jnp.float32)
        .at[rr].add(gg.astype(jnp.float32)).astype(jnp.bfloat16))))
    report("unsorted-ss-f32", diff_time(mk(
        lambda gg, rr: jax.ops.segment_sum(
            gg.astype(jnp.float32), rr,
            num_segments=V).astype(jnp.bfloat16))))

    from relationprediction_tpu.ops.scatter_accum import accumulate_rows
    report("windowed-onehot", diff_time(mk(
        lambda gg, rr: accumulate_rows(gg, rr, V).astype(jnp.bfloat16))))
    report("windowed-4k-1k", diff_time(mk(
        lambda gg, rr: accumulate_rows(gg, rr, V, chunk=4096,
                                       window=1024).astype(jnp.bfloat16))))
    report("windowed-1k-512", diff_time(mk(
        lambda gg, rr: accumulate_rows(gg, rr, V, chunk=1024,
                                       window=512).astype(jnp.bfloat16))))

    # one-hot MXU accumulation: sort ids, then for each chunk of C rows
    # compute onehot(ids)[C, V_win] against a WINDOW of the table...
    # window bounds are data-dependent -> instead use the full-V one-hot
    # per chunk but contract on the MXU: [V, C] @ [C, D]. FLOPs:
    # (N/C) * 2*V*C*D = 2*N*V*D = 4.4 TFLOP -> ~23 ms at peak; DOA at
    # this V. Included only to document why it loses.
    C = 4096

    def onehot_mm(gg, rr):
        acc = jnp.zeros((V, D), jnp.float32)

        def body(i, acc):
            ids = jax.lax.dynamic_slice(rr, (i * C,), (C,))
            blk = jax.lax.dynamic_slice(gg, (i * C, 0), (C, D))
            oh = (ids[None, :] == jnp.arange(V)[:, None]).astype(
                jnp.bfloat16)
            return acc + jnp.dot(oh, blk,
                                 preferred_element_type=jnp.float32)
        acc = jax.lax.fori_loop(0, N // C, body, acc)
        return acc.astype(jnp.bfloat16)
    try:
        report("onehot-mm", diff_time(mk(onehot_mm)))
    except Exception as e:  # noqa: BLE001
        print(f"onehot-mm         failed: {type(e).__name__}")


if __name__ == "__main__":
    main()
