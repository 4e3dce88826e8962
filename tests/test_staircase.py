"""Staircase SpMM kernel: bit-parity vs segment_sum, VJP, shards, layouts."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relationprediction_tpu.ops.staircase import (
    StaircaseLayout, build_staircase_layout, staircase_aggregate,
    staircase_aggregate_xla)


def make_problem(rng, e=640, v=100, d=64, pad=32, zipf=True):
    """Random edge targets + weights with phantom padding rows."""
    targets = rng.integers(0, v, e).astype(np.int32)
    if zipf:  # power-law-ish concentration on low ids
        heavy = rng.random(e) < 0.3
        targets[heavy] = rng.integers(0, max(2, v // 20), heavy.sum())
    weights = rng.random(e).astype(np.float32) + 0.1
    targets = np.concatenate([targets, np.full(pad, v, np.int32)])
    weights = np.concatenate([weights, np.zeros(pad, np.float32)])
    msgs = rng.standard_normal((e + pad, d)).astype(np.float32)
    return targets, weights, msgs


def oracle(targets, weights, msgs, v):
    out = np.zeros((v, msgs.shape[1]), np.float64)
    for t, w, m in zip(targets, weights, msgs):
        if t < v and w != 0.0:
            out[t] += w * m.astype(np.float64)
    return out.astype(np.float32)


@pytest.mark.parametrize("rb,chunk", [(8, 16), (16, 8), (32, 32)])
def test_matches_oracle(rng, rb, chunk):
    targets, weights, msgs = make_problem(rng)
    v = 100
    layout = build_staircase_layout(targets, weights, v, rb=rb, chunk=chunk)
    out = staircase_aggregate(jnp.asarray(msgs), layout, v, True)
    want = oracle(targets, weights, msgs, v)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-5, atol=1e-5)


def test_matches_xla_fallback(rng):
    targets, weights, msgs = make_problem(rng)
    v = 100
    layout = build_staircase_layout(targets, weights, v, rb=16, chunk=16)
    out_k = staircase_aggregate(jnp.asarray(msgs), layout, v, True)
    out_x = staircase_aggregate_xla(jnp.asarray(msgs), layout, v)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=5e-5, atol=1e-5)


def test_empty_row_blocks_zeroed(rng):
    # all edges hit vertex 0: every other row block must come out zero,
    # exercising the per-block zero-init padding chunks.
    e, v, d = 64, 64, 8
    targets = np.zeros(e, np.int32)
    weights = np.ones(e, np.float32)
    msgs = rng.standard_normal((e, d)).astype(np.float32)
    layout = build_staircase_layout(targets, weights, v, rb=8, chunk=8)
    out = np.asarray(staircase_aggregate(jnp.asarray(msgs), layout, v, True))
    np.testing.assert_allclose(out[0], msgs.sum(0), rtol=1e-5)
    assert np.all(out[1:] == 0.0)


def test_sharded_layout_parity(rng):
    targets, weights, msgs = make_problem(rng, e=512, pad=0)
    v = 100
    single = build_staircase_layout(targets, weights, v, rb=16, chunk=16)
    want = staircase_aggregate(jnp.asarray(msgs), single, v, True)

    # 4 contiguous shards, each with a shard-local staircase; summing the
    # per-shard aggregates must reproduce the global aggregation exactly.
    sharded = build_staircase_layout(targets, weights, v, rb=16, chunk=16,
                                     shards=4)
    per_chunks = sharded.n_chunks // 4
    per_edges = len(targets) // 4
    total = np.zeros_like(np.asarray(want))
    for s in range(4):
        sub = StaircaseLayout(
            perm=sharded.perm[s * per_chunks * 16:(s + 1) * per_chunks * 16],
            local_rows=sharded.local_rows[s * per_chunks:(s + 1) * per_chunks],
            weights=sharded.weights[s * per_chunks:(s + 1) * per_chunks],
            chunk_rb=sharded.chunk_rb[s * per_chunks:(s + 1) * per_chunks],
            bwd_targets=sharded.bwd_targets[s * per_edges:(s + 1) * per_edges],
            bwd_weights=sharded.bwd_weights[s * per_edges:(s + 1) * per_edges],
            rb=16, chunk=16, v_pad=sharded.v_pad, shards=1)
        local_msgs = jnp.asarray(msgs[s * per_edges:(s + 1) * per_edges])
        total += np.asarray(staircase_aggregate(local_msgs, sub, v, True))
    np.testing.assert_allclose(total, np.asarray(want), rtol=2e-5, atol=1e-5)


def test_vjp_matches_xla_vjp(rng):
    targets, weights, msgs = make_problem(rng, e=320, v=64, d=16)
    v = 64
    layout = build_staircase_layout(targets, weights, v, rb=8, chunk=8)
    cot = rng.standard_normal((v, 16)).astype(np.float32)

    def f_kernel(m):
        return jnp.vdot(staircase_aggregate(m, layout, v, True),
                        jnp.asarray(cot))

    def f_xla(m):
        return jnp.vdot(staircase_aggregate_xla(m, layout, v),
                        jnp.asarray(cot))

    g_k = jax.grad(f_kernel)(jnp.asarray(msgs))
    g_x = jax.grad(f_xla)(jnp.asarray(msgs))
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                               rtol=1e-6, atol=1e-6)


def test_layout_is_jit_static(rng):
    """StaircaseLayout crosses jit boundaries as a pytree without retrace
    churn on the static fields."""
    targets, weights, msgs = make_problem(rng, e=128, v=32, d=8)
    layout = build_staircase_layout(targets, weights, 32, rb=8, chunk=8)

    calls = []

    @jax.jit
    def run(m, lo):
        calls.append(1)
        return staircase_aggregate(m, lo, 32, True)

    a = run(jnp.asarray(msgs), layout)
    b = run(jnp.asarray(msgs) * 2, layout)
    assert len(calls) == 1
    np.testing.assert_allclose(np.asarray(b), 2 * np.asarray(a), rtol=1e-6)


def test_bf16_compute_dtype(rng):
    targets, weights, msgs = make_problem(rng, e=320, v=64, d=16)
    v = 64
    layout = build_staircase_layout(targets, weights, v, rb=8, chunk=8)
    out = staircase_aggregate(jnp.asarray(msgs), layout, v, True,
                              jnp.bfloat16)
    want = oracle(targets, weights, msgs, v)
    assert out.dtype == jnp.float32  # f32 accumulation
    np.testing.assert_allclose(np.asarray(out), want, rtol=3e-2, atol=3e-2)
