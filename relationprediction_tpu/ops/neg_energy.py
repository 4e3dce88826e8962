"""Factored negative-energy scoring with a rank-structured backward.

The factored binomial loss (models/build.py:loss_binomial_factored —
the reference's exact corruption protocol, auxilliaries.py:13-33 +
bilinear_diag.py:27-34, computed without the (rate+1)-tiled batch)
scores each corrupted entity against a per-positive factor:

    energy[n, k] = < codes[neg_values[n, k]],  q_sel[n, k] >
    q_sel[n, k]  = q_subj[n]  if the subject slot was corrupted
                   q_obj[n]   if the object slot was corrupted

XLA's autodiff of the naive formulation materializes the [n, k, d]
broadcasts/reshapes of the factors (fwd AND bwd) and ends in a ~1 KB-row
scatter-add into the [V, d] code-grad table that runs at ~30 GB/s —
together ~15 ms of the production train step (benchmarks/decoder_trace.py).

This op computes the same energies with two reduce-fusions over the
gathered ev rows (no materialized q_sel), and its custom backward
exploits the RANK STRUCTURE of the cotangent: row j's contribution to
the code-grad table is

    dTable[neg_values_j] += dE_j * q_sel[n_j] + 2 * dS_j * codes[neg_values_j]

— a scalar-weighted row of a SMALL table ([n, d] factors / [V, d]
codes, tens of MB). So the backward sorts only the 4-byte ids, builds
the cotangent payload directly in sorted order by gathering from those
small tables (fast), and accumulates through the windowed one-hot MXU
loop (ops/scatter_accum.py) instead of a scatter. The ev_sq output
(sum of squares of the gathered rows, consumed by the reference's
regularization mean) shares the same pass and the same backward.

Exactness: identical objective; float accumulation orders differ from
the naive formulation (f32 energy accumulation here — slightly better
than the bf16 single-reduce it replaces).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .scatter_accum import _round_up, accumulate_sorted_payload

_CHUNK = 2048
_WINDOW = 512


def factored_negative_energies(codes: jax.Array, q_subj: jax.Array,
                               q_obj: jax.Array, neg_values: jax.Array,
                               corrupt_object: jax.Array):
    """(neg_energy [n,k] f32, ev_sq [n,k] f32).

    codes: [V, d] entity codes (stream dtype); q_subj/q_obj: [n, d]
    per-positive factors; neg_values: [n, k] int32 corrupted entity
    ids; corrupt_object: [n, k] bool (True -> object slot replaced, so
    the candidate scores against q_obj... the OBJECT-corrupted slot
    keeps the positive's subject and relation, i.e. scores against
    object_factor(e1, r) = q_obj).
    """
    n, k = neg_values.shape
    v = codes.shape[0]
    if (codes.dtype != jnp.bfloat16 or n * k < 4 * _CHUNK
            or v < 2 * _WINDOW):
        return _direct(codes, q_subj, q_obj, neg_values, corrupt_object)
    return _fused(codes, q_subj, q_obj, neg_values, corrupt_object)


@jax.custom_vjp
def _take_rows_sorted_bwd(table, rows):
    """``table[rows]`` whose TRANSPOSE accumulates via sort + sorted
    segment-sum instead of a raw scatter-add. Runtime-neutral vs XLA's
    scatter, but the scatter's COMPILE cost on this backend is
    pathological (~6x slower for the single op; the round-3 404 s layer
    compiles traced to scatter lowering) — so the non-fused paths must
    keep this backward for f32 streams (round-5 review finding)."""
    return jnp.take(table, rows, axis=0)


def _trs_fwd(table, rows):
    return jnp.take(table, rows, axis=0), (rows, table.shape[0])


def _trs_bwd(res, g):
    rows, n_rows = res
    order = jnp.argsort(rows)
    d = jax.ops.segment_sum(
        jnp.take(g, order, axis=0), jnp.take(rows, order),
        num_segments=n_rows, indices_are_sorted=True)
    return d.astype(g.dtype), np.zeros(rows.shape, jax.dtypes.float0)


_take_rows_sorted_bwd.defvjp(_trs_fwd, _trs_bwd)


def _take_rows(table, rows2d):
    """2-D row take with the sorted-accumulation backward."""
    return _take_rows_sorted_bwd(table, rows2d.reshape(-1)).reshape(
        rows2d.shape + (table.shape[1],))


def _direct(codes, q_subj, q_obj, neg_values, corrupt_object):
    """Reference formulation; autodiff handles the backward (CPU tests,
    f32 streams, tiny shapes). Same multiply/accumulate dtypes as the
    fused path so the dispatch choice never changes numerics."""
    ev = _take_rows(codes, neg_values)                      # [n,k,d]
    co_f = corrupt_object.astype(jnp.float32)
    es = jnp.sum(ev * q_subj[:, None, :], axis=-1, dtype=jnp.float32)
    eo = jnp.sum(ev * q_obj[:, None, :], axis=-1, dtype=jnp.float32)
    energy = es + co_f * (eo - es)
    ev_sq = jnp.sum(ev.astype(jnp.float32) ** 2, axis=-1)
    return energy, ev_sq


def _accumulate_code_grads(codes, factor_table, rows, w1, w2, fsel):
    """Shared tail of the fused backwards: one variadic sort carries the
    4-byte per-row streams (id, dE weight, 2dS weight, factor index) to
    sorted order; the payload is built by gathering the SMALL factor
    table; the windowed one-hot MXU accumulation produces the [V, d+1]
    table whose extra column holds the per-entity 2dS sums, folded back
    as codes * scalar (the regularization term's code-grad — no codes
    regather). Returns d_codes in codes.dtype."""
    v, d = codes.shape
    n_flat = rows.shape[0]
    rs, w1s, w2s, fsels = jax.lax.sort(
        (rows, w1, w2, fsel), dimension=0, num_keys=1)
    n_pad = _round_up(n_flat, _CHUNK)
    if n_pad != n_flat:
        pad = n_pad - n_flat
        rs = jnp.concatenate([rs, jnp.broadcast_to(rs[-1], (pad,))])
        w1s = jnp.concatenate([w1s, jnp.zeros(pad, w1s.dtype)])
        w2s = jnp.concatenate([w2s, jnp.zeros(pad, w2s.dtype)])
        fsels = jnp.concatenate([fsels, jnp.zeros(pad, fsels.dtype)])
    ft16 = factor_table.astype(jnp.bfloat16)
    payload = jnp.concatenate(
        [jnp.take(ft16, fsels, axis=0) * w1s[:, None],
         w2s[:, None].astype(jnp.bfloat16)], axis=1)        # [N, d+1]
    table = accumulate_sorted_payload(
        payload, rs, v, chunk=_CHUNK, window=_WINDOW)       # [v, d+1] f32
    return (table[:, :d]
            + codes.astype(jnp.float32) * table[:, d:d + 1]
            ).astype(codes.dtype)


@jax.custom_vjp
def _fused(codes, q_subj, q_obj, neg_values, corrupt_object):
    energy, ev_sq, _ = _fused_fwd_impl(codes, q_subj, q_obj, neg_values,
                                       corrupt_object)
    return energy, ev_sq


def _fused_fwd_impl(codes, q_subj, q_obj, neg_values, corrupt_object):
    # Broadcast-multiply-reduce (NOT einsum): XLA fuses each into one
    # pass over the bf16 ev rows with f32 accumulation; the einsum form
    # materializes a f32 [n,k,d] copy (+2 ms) and reads it four times.
    ev = jnp.take(codes, neg_values, axis=0)                # [n,k,d]
    co_f = corrupt_object.astype(jnp.float32)
    es = jnp.sum(ev * q_subj[:, None, :], axis=-1, dtype=jnp.float32)
    eo = jnp.sum(ev * q_obj[:, None, :], axis=-1, dtype=jnp.float32)
    energy = es + co_f * (eo - es)
    ev_sq = jnp.sum(ev.astype(jnp.float32) ** 2, axis=-1)
    return energy, ev_sq, ev


def _fused_fwd(codes, q_subj, q_obj, neg_values, corrupt_object):
    energy, ev_sq, ev = _fused_fwd_impl(codes, q_subj, q_obj, neg_values,
                                        corrupt_object)
    return (energy, ev_sq), (codes, q_subj, q_obj, neg_values,
                             corrupt_object, ev)


def _fused_bwd(res, cot):
    dE, dS = cot                                            # [n,k] each
    codes, q_subj, q_obj, neg_values, corrupt_object, ev = res
    n, k = neg_values.shape
    v, d = codes.shape
    co_f = corrupt_object.astype(jnp.float32)
    dE = dE.astype(jnp.float32)
    dS = dS.astype(jnp.float32)

    # Factor grads: one broadcast-multiply-reduce pass over ev each.
    a = (dE * (1.0 - co_f)).astype(ev.dtype)
    b = (dE * co_f).astype(ev.dtype)
    dq_subj = jnp.sum(a[:, :, None] * ev, axis=1,
                      dtype=jnp.float32).astype(q_subj.dtype)
    dq_obj = jnp.sum(b[:, :, None] * ev, axis=1,
                     dtype=jnp.float32).astype(q_obj.dtype)

    # Code-table grad. Row j contributes
    #   dE_j * qcat[fsel_j]  +  (2 dS_j) * codes[rows_j]
    # — rank structure the shared helper exploits (payload built from
    # the small qcat factor table; the 2dS term rides as the extra
    # payload column — d=500 occupies 512 lanes per tile anyway; one
    # variadic sort replaces three ~3 ms scalar gathers).
    rows = neg_values.reshape(-1)
    n_flat = rows.shape[0]
    qcat = jnp.concatenate([q_subj, q_obj], axis=0)
    fsel = (jnp.arange(n_flat, dtype=jnp.int32) // k
            + corrupt_object.reshape(-1).astype(jnp.int32) * n)
    d_codes = _accumulate_code_grads(
        codes, qcat, rows, dE.reshape(-1).astype(jnp.bfloat16),
        (2.0 * dS.reshape(-1)).astype(jnp.float32), fsel)

    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)  # noqa: E731
    return d_codes, dq_subj, dq_obj, f0(neg_values), f0(corrupt_object)


_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Single-factor variant (the structured/split loss: every corruption of
# a group scores against ONE per-positive factor)
# ---------------------------------------------------------------------------

def single_factor_negative_energies(codes: jax.Array, q: jax.Array,
                                    neg_values: jax.Array):
    """(energy [n,k] f32, ev_sq [n,k] f32) with
    energy[n,k] = <codes[neg_values[n,k]], q[n]>.

    The split loss's per-direction negative block
    (models/build.py:loss_structured); same rank-structured backward as
    the binomial op, with no coin-flip factor selection.
    """
    n, k = neg_values.shape
    v = codes.shape[0]
    if (codes.dtype != jnp.bfloat16 or n * k < 4 * _CHUNK
            or v < 2 * _WINDOW):
        return _single_direct(codes, q, neg_values)
    return _single_fused(codes, q, neg_values)


def _single_direct(codes, q, neg_values):
    ev = _take_rows(codes, neg_values)                      # [n,k,d]
    energy = jnp.sum(ev * q[:, None, :], axis=-1, dtype=jnp.float32)
    ev_sq = jnp.sum(ev.astype(jnp.float32) ** 2, axis=-1)
    return energy, ev_sq


@jax.custom_vjp
def _single_fused(codes, q, neg_values):
    energy, ev_sq, _ = _single_fwd_impl(codes, q, neg_values)
    return energy, ev_sq


def _single_fwd_impl(codes, q, neg_values):
    ev = jnp.take(codes, neg_values, axis=0)
    energy = jnp.sum(ev * q[:, None, :], axis=-1, dtype=jnp.float32)
    ev_sq = jnp.sum(ev.astype(jnp.float32) ** 2, axis=-1)
    return energy, ev_sq, ev


def _single_fwd(codes, q, neg_values):
    energy, ev_sq, ev = _single_fwd_impl(codes, q, neg_values)
    return (energy, ev_sq), (codes, q, neg_values, ev)


def _single_bwd(res, cot):
    dE, dS = cot
    codes, q, neg_values, ev = res
    n, k = neg_values.shape
    v, d = codes.shape
    dE = dE.astype(jnp.float32)
    dS = dS.astype(jnp.float32)

    dq = jnp.sum(dE.astype(ev.dtype)[:, :, None] * ev, axis=1,
                 dtype=jnp.float32).astype(q.dtype)

    rows = neg_values.reshape(-1)
    n_flat = rows.shape[0]
    d_codes = _accumulate_code_grads(
        codes, q, rows, dE.reshape(-1).astype(jnp.bfloat16),
        (2.0 * dS.reshape(-1)).astype(jnp.float32),
        jnp.arange(n_flat, dtype=jnp.int32) // k)

    f0 = np.zeros(neg_values.shape, jax.dtypes.float0)
    return d_codes, dq, f0


_single_fused.defvjp(_single_fwd, _single_bwd)
