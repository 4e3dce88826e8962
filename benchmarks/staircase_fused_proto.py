#!/usr/bin/env python
"""Prototype: staircase scatter with the relational transform fused in.

Mode 'block': x_sc holds gathered source features (j-major block layout) in
slot order; each 8-slot group shares one relation; the kernel loads the
relation's [dr*dr, B] weight tile from a VMEM-resident stack, applies the
block-diagonal transform with dr^2 vector FMAs, and feeds the result
straight into the one-hot scatter matmul. Messages never touch HBM.

Mode 'basis': per-chunk MXU contraction x[C,d] @ W_flat[d, B*d] followed by
the coefficient contraction, then the scatter matmul.

Timing-only (random metadata, no numerics check — production version gets
oracle tests).
"""
from __future__ import annotations

import functools
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

    V, D, R, B = 14541, 500, 237, 100
    DR = D // B
    E = 131072
    rng = np.random.default_rng(0)

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

    for rb, C, K, dtype in ((256, 512, 5, jnp.bfloat16),
                            (256, 512, 5, jnp.float32),
                            (512, 512, 10, jnp.bfloat16),
                            (256, 1024, 3, jnp.bfloat16)):
        n_blocks = -(-V // rb)
        n_rows = n_blocks          # uniform assumption for the prototype
        S = n_rows * K * C
        G = C // 8                 # groups per chunk

        targets = np.sort(rng.integers(0, V, E).astype(np.int32))
        lrows = np.full(S, rb, np.int32)
        # spread edges uniformly into slot space (timing only)
        lrows[:E] = targets % rb
        lrows = lrows.reshape(n_rows, K, 1, C)
        group_rel = rng.integers(0, R, (n_rows * K * G,)).astype(np.int32)

        x_sc = jnp.asarray(
            rng.standard_normal((S, D)).astype(np.float32)).astype(dtype)
        w_j = jnp.asarray(
            rng.standard_normal((R, DR * DR, B)).astype(np.float32)
        ).astype(dtype)
        lrows_dev = jnp.asarray(lrows)
        group_rel_dev = jnp.asarray(group_rel)

        def kernel(grel_ref, rows_ref, x_ref, w_ref, out_ref, y_ref):
            i = pl.program_id(0)
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)

            def group_body(g, _):
                rel = grel_ref[(i * K + j) * G + g]
                w = w_ref[rel]                      # [dr*dr, B]
                base = pl.multiple_of(g * 8, 8)
                xg = x_ref[pl.ds(base, 8), :]       # [8, D] j-major
                for i_ in range(DR):
                    acc = None
                    for j_ in range(DR):
                        t = w[i_ * DR + j_, :][None, :] \
                            * xg[:, j_ * B:(j_ + 1) * B]
                        acc = t if acc is None else acc + t
                    y_ref[pl.ds(base, 8), i_ * B:(i_ + 1) * B] = acc
                return 0

            jax.lax.fori_loop(0, G, group_body, 0)

            rows = rows_ref[0, 0, 0, :]
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (rb, C), 0)
            onehot = (row_ids == rows[None, :]).astype(x_ref.dtype)
            out_ref[0] += jnp.dot(onehot, y_ref[...],
                                  preferred_element_type=jnp.float32)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_rows, K),
            in_specs=[
                pl.BlockSpec((1, 1, 1, C), lambda i, j, s: (i, j, 0, 0)),
                pl.BlockSpec((C, D), lambda i, j, s: (i * K + j, 0)),
                pl.BlockSpec((R, DR * DR, B), lambda i, j, s: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, rb, D), lambda i, j, s: (i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((C, D), dtype)],
        )
        call = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_rows, rb, D), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )

        def agg(x, w, acc):
            out = call(group_rel_dev, lrows_dev, x + acc.astype(x.dtype), w)
            return out.astype(jnp.float32).sum() * 0.0

        name = "bf16" if dtype == jnp.bfloat16 else "f32 "
        try:
            dt = timed(agg, x_sc, w_j)
        except Exception as e:
            print(f"FUSED-BLOCK rb={rb} C={C} {name}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}")
            continue
        itemsz = 2 if dtype == jnp.bfloat16 else 4
        gb = (S * D * itemsz + n_rows * rb * D * 4) / 1e9
        print(f"FUSED-BLOCK rb={rb:4d} C={C:5d} {name} slots={S:7d} "
              f"{dt*1e3:8.3f} ms  {gb/dt:6.1f} GB/s  "
              f"({E/dt/1e6:6.2f} M edges/s)")


if __name__ == "__main__":
    main()
