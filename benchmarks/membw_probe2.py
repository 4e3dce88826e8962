#!/usr/bin/env python
"""Cross-validate the chip's HBM / MXU ceilings with overhead-free timing.

Round-4 verdict flagged that docs/ROOFLINE.md's 277 GB/s HBM ceiling —
measured by membw_probe.py's single-call fori-loop at N_ITERS=20 — could
be a methodology artifact. It is: one tunneled dispatch costs ~25-30 ms
of fixed overhead, and dividing (overhead + N*t_iter) by N=20 adds
~1.4 ms to every per-iteration number. This probe removes the fixed cost
exactly by DIFFERENCING: run the same in-graph loop at two iteration
counts N1 < N2 and report t_iter = (T(N2) - T(N1)) / (N2 - N1). The
implied intercept T(N1) - N1*t_iter is printed as `ovh` so the fixed
cost is visible rather than silently folded in.

Independent formulations (per round-4 verdict item 1):
  * 3-stream `acc += x`            (read x, read acc, write acc)
  * 2-stream copy `y = x + eps`    (read x, write y; eps defeats hoisting)
  * 1-stream reduce `(x + acc).sum()`  (read x only; fused add+reduce)
  * multi-array reduce over 3 arrays   (concurrent read streams)
  * sorted / random 2 KB-row gathers   (the production access pattern)
all at several sizes, plus the bf16/f32 GEMM ceilings re-measured the
same way. Each probe prints implied GB/s (or TFLOP/s) from its true
per-iteration byte/FLOP count.

Run on the real chip:  python benchmarks/membw_probe2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N1, N2 = 40, 200
REPS = 3  # best-of to shave tunnel jitter


def _diff_time(jax, build, *args):
    """build(n) -> jitted fn of *args running n in-graph iterations.

    Returns (t_iter_seconds, fixed_overhead_seconds) via differencing.
    """
    f1, f2 = build(N1), build(N2)
    float(f1(*args))  # compile both
    float(f2(*args))
    t1 = min(_wall(f1, *args) for _ in range(REPS))
    t2 = min(_wall(f2, *args) for _ in range(REPS))
    t_iter = (t2 - t1) / (N2 - N1)
    return t_iter, t1 - N1 * t_iter


def _wall(f, *args):
    t0 = time.perf_counter()
    float(f(*args))
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"device: {jax.devices()[0]}  (diff timing N={N1}->{N2}, "
          f"best of {REPS})")

    def report(name, t_iter, ovh, gb=None, tflop=None):
        rate = (f"{gb / t_iter:7.1f} GB/s" if gb is not None
                else f"{tflop / t_iter:6.1f} TFLOP/s")
        print(f"{name:<46s} {t_iter * 1e3:8.3f} ms/it  {rate}   "
              f"(ovh {ovh * 1e3:5.1f} ms)")

    sizes_mb = [64, 256, 1024]
    for mb in sizes_mb:
        n = mb * 1024 * 1024 // 4
        x = jnp.ones((n,), jnp.float32)

        # 3-stream: acc += x   (the round-2..4 probe, now overhead-free)
        def build3(iters):
            @jax.jit
            def f(acc, x):
                return jax.lax.fori_loop(
                    0, iters, lambda k, a: a + x, acc).sum()
            return lambda: f(jnp.zeros((n,), jnp.float32), x)
        t, o = _diff_time(jax, build3)
        report(f"3-stream acc+=x        {mb:5d} MB", t, o, gb=n * 4 * 3 / 1e9)

        # 2-stream copy: the loop CARRY is the full destination array, so
        # every iteration must materialize y = x + y_prev[0] (read x full,
        # read one tile of y_prev, write y full). Dead-code elimination
        # cannot shrink it because y is the carry.
        def build2(iters):
            @jax.jit
            def f(y0, x):
                return jax.lax.fori_loop(
                    0, iters, lambda k, y: x + y[0], y0)[0]
            return lambda: f(jnp.zeros((n,), jnp.float32), x)
        t, o = _diff_time(jax, build2)
        report(f"2-stream y=x+eps       {mb:5d} MB", t, o, gb=n * 4 * 2 / 1e9)

        # 1-stream reduce: acc += (x + acc*0-ish).sum(); the scalar acc
        # perturbs x inside the fused reduce so nothing hoists, and no
        # large array is written.
        def build1(iters):
            @jax.jit
            def f(x):
                def it(k, a):
                    return (x + a).sum() * 1e-30 + a
                return jax.lax.fori_loop(0, iters, it, jnp.float32(0.0))
            return lambda: f(x)
        t, o = _diff_time(jax, build1)
        report(f"1-stream read reduce   {mb:5d} MB", t, o, gb=n * 4 / 1e9)

    # multi-array concurrent read streams (3 x 256 MB). Each term is
    # perturbed by the carry so XLA cannot hoist a combined x1+x2+x3
    # (which it DOES do for the naive formulation — measured: collapses
    # to exactly the 1-array time).
    n = 256 * 1024 * 1024 // 4
    xs = [jnp.full((n,), float(i + 1), jnp.float32) for i in range(3)]

    def build_multi(iters):
        @jax.jit
        def f(x1, x2, x3):
            def it(k, a):
                s = ((x1 + a).sum() + (x2 + 2 * a).sum()
                     + (x3 + 3 * a).sum())
                return s * 1e-30 + a
            return jax.lax.fori_loop(0, iters, it, jnp.float32(0.0))
        return lambda: f(*xs)
    t, o = _diff_time(jax, build_multi)
    report("3-array read reduce     3x256 MB", t, o, gb=n * 4 * 3 / 1e9)

    # 2 KB-row gathers at the staircase2 slot scale
    v, d, s = 14541, 500, 145920
    tab = jnp.ones((v, d), jnp.float32)
    rng = np.random.default_rng(0)
    idx_sorted = jnp.asarray(np.sort(rng.integers(0, v, s)).astype(np.int32))
    idx_rand = jnp.asarray(rng.permutation(
        np.repeat(np.arange(v), -(-s // v))[:s]).astype(np.int32))
    for name, idx in [("sorted", idx_sorted), ("random", idx_rand)]:
        for dt_, dn, nb in [(jnp.float32, "f32", 4), (jnp.bfloat16, "bf16", 2)]:
            tab_t = tab.astype(dt_)

            def build_g(iters, idx=idx, tab_t=tab_t, dt_=dt_):
                # Carry-perturbed INDICES: `tab[idx]` alone is
                # loop-invariant and LICM hoists it, timing only the
                # accumulator add (round-5 review finding — the first
                # version of this probe reported add bandwidth as
                # gather bandwidth). 0*acc[0,0] is not provably 0 for
                # floats, so the gather stays inside the loop.
                @jax.jit
                def f(acc, tab, idx):
                    def it(k, a):
                        i2 = idx + (a[0, 0] * 0).astype(jnp.int32)
                        return a + jnp.take(tab, i2, axis=0)
                    return jax.lax.fori_loop(0, iters, it, acc).sum()
                return lambda: f(jnp.zeros((s, d), dt_), tab_t, idx)
            t, o = _diff_time(jax, build_g)
            gb = s * d * nb * 3 / 1e9  # gather read + acc read + acc write
            print(f"row gather {name} {dn} [{s}x{d}] 3-stream "
                  f"{t * 1e3:8.3f} ms/it  {gb / t:7.1f} GB/s   "
                  f"(ovh {o * 1e3:5.1f} ms)")

    # GEMM ceilings. NOTE: on TPU an f32-input dot still runs the MXU in
    # bf16 passes unless precision=HIGHEST is requested — the "f32" row
    # below uses HIGHEST so it is the true f32 ceiling.
    from jax import lax
    for prec, name in [(None, "bf16"), (lax.Precision.HIGHEST, "f32")]:
        dtype = jnp.bfloat16 if prec is None else jnp.float32
        m, k = 4096, 16384
        a = jnp.ones((m, k), dtype)
        b = jnp.ones((k, m), dtype)

        def build_gemm(iters, a=a, b=b, dtype=dtype, prec=prec):
            @jax.jit
            def f(acc, a, b):
                def it(i, acc):
                    a2 = a * (1 + acc[0, 0]).astype(dtype)
                    return acc + jnp.dot(
                        a2, b, preferred_element_type=jnp.float32,
                        precision=prec)
                return jax.lax.fori_loop(0, iters, it, acc).sum()
            return lambda: f(jnp.zeros((m, m), jnp.float32), a, b)
        t, o = _diff_time(jax, build_gemm)
        report(f"GEMM {m}x{k}x{m} {name}", t, o,
               tflop=2 * m * m * k / 1e12)


if __name__ == "__main__":
    main()
