"""Row-accumulation (scatter-add) formulated for the TPU MXU.

The decoder backward must accumulate ~rate*n cotangent rows into the
[V, d] entity-code gradient table (the transpose of the corrupted-code
gather — reference: the embedding_lookup gradients implied by
/root/reference/code/decoders/bilinear_diag.py:19-24). Measured menu at
the production shape (300 k bf16 rows of d=500 into V=14,541;
benchmarks/scatter_bwd_bench.py, differenced timing on the chip):

  XLA scatter-add                 9.0 ms   (~30 GB/s — serialized row RMW)
  sorted segment-sum             11.1 ms   (lowers to scatter + a permute)
  full-V one-hot MXU matmul      26.3 ms   (runs at MXU peak; 15x the FLOPs)
  windowed one-hot + g[order]    11.9 ms   (the 300 MB payload permute
                                            alone costs 5.2 ms: random
                                            1 KB reads from a large HBM
                                            region run at ~115 GB/s)
  windowed one-hot, in-loop gather 10.6 ms (per-chunk gathers don't
                                            pipeline across iterations)
  windowed one-hot, SORTED payload ~3.7 ms (argsort 0.4 + loop 3.3)

Conclusion: the windowed MXU accumulation wins ONLY when the payload
arrives already in sorted-id order as contiguous chunks. That is exactly
what the factored binomial backward can do (ops/neg_energy.py): its
cotangent rows are scalar-weighted rows of SMALL per-positive factor
tables, so the sorted payload is built by gathering from ~30 MB tables
(fast) instead of permuting a 300 MB stream (slow).

``accumulate_sorted_payload`` implements the windowed loop:
cut the sorted stream into chunks of C rows; for uniformly drawn ids a
sorted chunk spans ~C*V/N ≈ C/20 consecutive ids, so a window of
W >> C/20 covers it with a wide margin; contract onehot(ids-base)[W, C]
against the chunk on the MXU and accumulate into table[base:base+W] by
dynamic-update-slice. A per-chunk span check guards exactness: if ANY
chunk spans >= W ids (adversarial distribution), a lax.cond falls back
to segment-sum for the whole call. Accumulation is f32 — an improvement
over the bf16 accumulation of the plain path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def sorted_window_plan(rs: jax.Array, n_rows: int, *, chunk: int,
                       window: int):
    """Per-chunk window bases + overflow flag for a SORTED id stream.

    rs must have length a multiple of ``chunk`` (pad with rs[-1]).
    Returns (bases [n_chunks], overflow scalar bool, v_pad).
    """
    v_pad = max(_round_up(n_rows, 8), window)
    firsts = rs[::chunk]
    lasts = rs[chunk - 1::chunk]
    bases = jnp.clip((firsts // 8) * 8, 0, v_pad - window)
    overflow = jnp.any(lasts - bases >= window)
    return bases, overflow, v_pad


def accumulate_sorted_payload(payload: jax.Array, rs: jax.Array,
                              n_rows: int, *, chunk: int = 2048,
                              window: int = 512) -> jax.Array:
    """sum_i onehot(rs[i]) * payload[i] -> [n_rows, d] f32.

    ``payload`` [N, d] bf16 rows ALREADY in ascending-``rs`` order (rows
    past the true count must be zero); ``rs`` [N] sorted ids, N a
    multiple of ``chunk``.
    """
    n, d = payload.shape
    if n % chunk:
        raise ValueError(f"payload length {n} not a multiple of {chunk}")
    acc_dtype = jnp.float32
    bases, overflow, v_pad = sorted_window_plan(
        rs, n_rows, chunk=chunk, window=window)
    n_chunks = n // chunk
    col = jax.lax.broadcasted_iota(jnp.int32, (window, chunk), 0)

    def windowed(args):
        payload, rs, bases = args

        def body(i, table):
            ids = jax.lax.dynamic_slice(rs, (i * chunk,), (chunk,))
            blk = jax.lax.dynamic_slice(payload, (i * chunk, 0),
                                        (chunk, d))
            base = bases[i]
            oh = (col == (ids - base)[None, :]).astype(jnp.bfloat16)
            delta = jnp.dot(oh, blk.astype(jnp.bfloat16),
                            preferred_element_type=acc_dtype)
            win = jax.lax.dynamic_slice(table, (base, 0), (window, d))
            return jax.lax.dynamic_update_slice(
                table, win + delta, (base, 0))

        table = jax.lax.fori_loop(
            0, n_chunks, body, jnp.zeros((v_pad, d), acc_dtype))
        return table[:n_rows]

    def fallback(args):
        payload, rs, _ = args
        return jax.ops.segment_sum(
            payload.astype(acc_dtype), rs, num_segments=n_rows,
            indices_are_sorted=True)

    return jax.lax.cond(overflow, fallback, windowed,
                        (payload, rs, bases))


def accumulate_rows(g: jax.Array, rows: jax.Array, n_rows: int, *,
                    chunk: int = 2048, window: int = 512) -> jax.Array:
    """sum_i onehot(rows[i]) * g[i] -> [n_rows, d] f32 (unsorted rows).

    Generic entry: when the payload must be permuted from an arbitrary
    large array, the permute costs more than the windowed loop saves
    (measured menu above), so below the windowed-win threshold this is
    a plain f32 segment-sum. At scale with bf16 payloads it sorts ids
    and builds the sorted payload with one permute — still the fastest
    GENERIC formulation only when the payload array is small enough to
    gather from quickly; production paths with rank-structured payloads
    should build the sorted payload themselves and call
    ``accumulate_sorted_payload``.
    """
    n, d = g.shape
    if g.dtype != jnp.bfloat16 or n < 4 * chunk or n_rows < 2 * window:
        return jax.ops.segment_sum(
            g.astype(jnp.float32), rows, num_segments=n_rows)
    order = jnp.argsort(rows)
    rs = jnp.take(rows, order)
    n_pad = _round_up(n, chunk)
    if n_pad != n:
        order = jnp.concatenate(
            [order, jnp.zeros(n_pad - n, order.dtype)])
        rs = jnp.concatenate(
            [rs, jnp.broadcast_to(rs[-1], (n_pad - n,))])
    payload = jnp.take(g, order, axis=0)
    if n_pad != n:
        valid = (jnp.arange(n_pad) < n)[:, None]
        payload = jnp.where(valid, payload, jnp.zeros_like(payload))
    return accumulate_sorted_payload(payload, rs, n_rows, chunk=chunk,
                                     window=window)
