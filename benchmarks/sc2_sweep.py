#!/usr/bin/env python
"""Re-sweep the fused staircase-v2 kernel parameters with honest timing,
and give the in-kernel row gather (round-4 verdict item 9) a measured
verdict.

The production (rb=256, chunk=512, k=auto) point was chosen in rounds
2-3 under the biased N=20 single-call timing (+~1.25 ms constant on
every measurement — see bench.py:timed). This sweeps the grid shape
with differenced timing at the flagship scale and times BOTH the bare
pallas_call and the full composed direction.

The gather prototype puts the whole [V, d] bf16 feature table in VMEM
(14.6 MB of the chip's 128 MB) and gathers rows by dynamic index inside
a kernel — the formulation Mosaic rejected as HBM row DMA in rounds
1-2, now attempted as VMEM dynamic indexing with SMEM id blocks.
"""
from __future__ import annotations

import time
import traceback

import numpy as np

N1, N2 = 20, 100


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import sys
    sys.path.insert(0, "/root/repo")
    from relationprediction_tpu.graph import build_graph_batch
    from relationprediction_tpu.ops import staircase2 as s2

    V, R, D, B = 14541, 237, 500, 100
    E = 131072
    rng = np.random.default_rng(0)
    rel_w = 1.0 / np.arange(1, R + 1)
    rel_w /= rel_w.sum()
    senders = rng.integers(0, V, E).astype(np.int32)
    relations = rng.choice(R, size=E, p=rel_w).astype(np.int32)
    receivers = rng.integers(0, V, E).astype(np.int32)
    weights = (rng.random(E).astype(np.float32) + 0.5)
    feats = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    blocks = jnp.asarray(
        rng.standard_normal((R, B, D // B, D // B)).astype(np.float32))
    blocks_j = s2.blocks_to_jmajor(blocks).astype(jnp.bfloat16)

    def diff_time(fn, *args):
        def build(iters):
            @jax.jit
            def f(*a):
                def it(k, acc):
                    return acc + fn(*a, acc)
                return jax.lax.fori_loop(0, iters, it, 0.0)
            return f
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

    print(f"device: {jax.devices()[0]}  E={E} V={V} d={D} B={B}")
    print(f"{'rb':>5s} {'chunk':>6s} {'k':>5s} {'slots':>7s} {'rows':>5s} "
          f"{'kernel ms':>10s} {'direction ms':>13s}")
    results = {}
    for rb in (256, 512):
        for chunk in (512, 1024):
            for k in (None, 2, 8):
                try:
                    pair = s2.build_staircase2_pair(
                        senders, relations, receivers, weights, V,
                        rb=rb, chunk=chunk, k=k, group=1)
                    layout = pair.fwd
                    x_sc = (jnp.take(s2.to_jmajor(feats, B),
                                     layout.sources, axis=0)
                            * layout.weights[:, None]).astype(jnp.bfloat16)
                    slot_rel = layout.slot_rel()
                    dt_k = diff_time(
                        lambda x, acc, lo=layout, sr=slot_rel:
                        s2._call_block(x + acc.astype(x.dtype), blocks_j,
                                       sr, lo, False).sum() * 0, x_sc)
                    dt_d = diff_time(
                        lambda f, acc, p=pair:
                        s2.block_direction(f + acc, blocks, p, B, V,
                                           False, jnp.bfloat16).sum() * 0,
                        feats)
                    kk = layout.k
                    print(f"{rb:5d} {chunk:6d} {kk:5d} "
                          f"{layout.n_slots:7d} {layout.n_rows:5d} "
                          f"{dt_k * 1e3:10.3f} {dt_d * 1e3:13.3f}")
                    results[(rb, chunk, kk)] = (dt_k, dt_d)
                except Exception as e:  # noqa: BLE001
                    print(f"{rb:5d} {chunk:6d} {k!s:>5s} FAILED: "
                          f"{type(e).__name__}: {e}")

    # ---- in-kernel VMEM row gather prototype --------------------------
    print("\n--- in-kernel VMEM gather prototype ---")
    S = 145920
    C = 512
    v_pad = -(-V // 8) * 8
    table = jnp.asarray(
        rng.standard_normal((v_pad, D)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, V, S).astype(np.int32))

    def gather_kernel(ids_ref, table_ref, out_ref):
        def body(j, _):
            out_ref[pl.ds(j, 1), :] = table_ref[pl.ds(ids_ref[j], 1), :]
            return 0
        jax.lax.fori_loop(0, C, body, 0)

    def vmem_gather(ids, table):
        return pl.pallas_call(
            gather_kernel,
            grid=(S // C,),
            in_specs=[
                pl.BlockSpec((C,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((v_pad, D), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((C, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, D), table.dtype),
        )(ids, table)

    try:
        out = vmem_gather(ids, table)
        ref = jnp.take(table, ids, axis=0)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"correct (max err {err:.2e})")
        dt = diff_time(
            lambda t, acc: vmem_gather(
                ids, t + acc.astype(t.dtype)).sum().astype(jnp.float32)
            * 0, table)
        gb = S * D * 2 * 2 / 1e9
        print(f"in-kernel VMEM gather [S={S}, d={D}] bf16: {dt*1e3:.3f} ms "
              f"({gb/dt:.1f} GB/s)  vs XLA take: ", end="")
        dt2 = diff_time(
            lambda t, acc: jnp.take(t + acc.astype(t.dtype), ids,
                                    axis=0).sum().astype(jnp.float32) * 0,
            table)
        print(f"{dt2*1e3:.3f} ms")
    except Exception:  # noqa: BLE001
        traceback.print_exc()
        print("in-kernel VMEM gather: REJECTED by Mosaic (see traceback)")


if __name__ == "__main__":
    main()
