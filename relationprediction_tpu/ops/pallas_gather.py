"""Pallas TPU kernels for the irregular-access hot ops.

XLA's row gather and scatter-add on TPU run at ~40 GB/s effective for the
[E, 500] edge workloads of this framework (measured, benchmarks/
microbench.py) — 20x below HBM bandwidth. These kernels reimplement them as
explicit multi-buffered row DMAs:

  * ``gather_rows``: out[i] = table[idx[i]] — per-edge feature/message
    gather with NBUF outstanding HBM->VMEM copies.
  * ``sorted_segment_sum``: CSR-style aggregation out[v] = sum_j w_j *
    msgs[perm[j]] over receiver-sorted edge runs — the relational SpMM
    (replaces ``tf.sparse_tensor_dense_matmul``, e.g. gcn_basis.py:78-79).

Both fall back to XLA implementations off-TPU (tests run them in Pallas
interpreter mode for bit-parity).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NBUF = 8  # outstanding DMAs


# ---------------------------------------------------------------------------
# gather_rows
# ---------------------------------------------------------------------------

def _gather_kernel(idx_ref, table_ref, out_ref, sem):
    blk = out_ref.shape[0]
    base = pl.program_id(0) * blk

    def make(i):
        row = idx_ref[base + i]
        return pltpu.make_async_copy(table_ref.at[row], out_ref.at[i],
                                     sem.at[i % NBUF])

    for i in range(NBUF):
        make(i).start()

    def body(i, _):
        make(i).wait()
        @pl.when(i + NBUF < blk)
        def _():
            make(i + NBUF).start()
        return 0

    jax.lax.fori_loop(0, blk, body, 0)


@functools.partial(jax.jit, static_argnames=("block_size", "interpret"))
def gather_rows(table: jax.Array, idx: jax.Array, *, block_size: int = 512,
                interpret: bool = False) -> jax.Array:
    """out[i, :] = table[idx[i], :] via pipelined row DMAs.

    idx length must be a multiple of block_size (pad with any valid index).
    """
    e = idx.shape[0]
    d = table.shape[1]
    if e % block_size != 0:
        raise ValueError(f"idx length {e} not a multiple of {block_size}")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e // block_size,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((block_size, d), lambda n, idx: (n, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NBUF,))],
    )
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((e, d), table.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=False),
    )(idx, table)


# ---------------------------------------------------------------------------
# sorted_segment_sum (CSR SpMM)
# ---------------------------------------------------------------------------

def _spmm_kernel(row_ptr_ref, perm_ref, msgs_ref, out_ref, acc,
                 slots, sem):
    """Messages arrive pre-scaled by their aggregation weight (the scale
    fuses into the message einsum for free on the XLA side), so the kernel
    is a pure pipelined gather-accumulate."""
    rb = out_ref.shape[0]           # rows per program
    r0 = pl.program_id(0) * rb

    acc[...] = jnp.zeros_like(acc)

    def make(j, slot):
        return pltpu.make_async_copy(msgs_ref.at[perm_ref[j]],
                                     slots.at[slot], sem.at[slot])

    for local_r in range(rb):
        start = row_ptr_ref[r0 + local_r]
        end = row_ptr_ref[r0 + local_r + 1]
        n = end - start

        def prefetch(k, _):
            make(start + k, k % NBUF).start()
            return 0
        jax.lax.fori_loop(0, jnp.minimum(n, NBUF), prefetch, 0,
                          unroll=False)

        def body(k, _):
            j = start + k
            slot = k % NBUF
            make(j, slot).wait()
            acc[local_r, :] += slots[slot]
            # Reuse the slot for edge k+NBUF once consumed.
            @pl.when(k + NBUF < n)
            def _():
                make(j + NBUF, (k + NBUF) % NBUF).start()
            return 0
        jax.lax.fori_loop(0, n, body, 0, unroll=False)

    out_ref[...] = acc[...]


@functools.partial(jax.jit,
                   static_argnames=("n_rows", "rows_per_block", "interpret"))
def sorted_segment_sum(msgs: jax.Array, perm: jax.Array,
                       row_ptr: jax.Array, *, n_rows: int,
                       rows_per_block: int = 8,
                       interpret: bool = False) -> jax.Array:
    """out[v] = sum_{j in [row_ptr[v], row_ptr[v+1])} msgs[perm[j]].

    Messages must already carry their aggregation weight. Edges are
    pre-sorted by target row (host-side); ``perm`` maps sorted position ->
    message-array row, fusing the layout permutation into the gather.
    n_rows must be a multiple of rows_per_block (pad row_ptr by repeating
    its last value).
    """
    d = msgs.shape[1]
    if n_rows % rows_per_block != 0:
        raise ValueError(f"n_rows {n_rows} not a multiple of "
                         f"{rows_per_block}")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # row_ptr, perm
        grid=(n_rows // rows_per_block,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # msgs (HBM)
        ],
        out_specs=pl.BlockSpec((rows_per_block, d), lambda n, *_: (n, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows_per_block, d), jnp.float32),
            pltpu.VMEM((NBUF, d), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    return pl.pallas_call(
        _spmm_kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, d), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(row_ptr, perm, msgs)


# ---------------------------------------------------------------------------
# XLA reference implementations (fallback + test oracle)
# ---------------------------------------------------------------------------

def gather_rows_xla(table, idx):
    return table[idx]


def sorted_segment_sum_xla(msgs, perm, row_ptr, n_rows):
    e = perm.shape[0]
    # Row of edge j = #rows whose run ends at or before j.
    row_ids = jnp.searchsorted(row_ptr[1:], jnp.arange(e), side="right")
    return jax.ops.segment_sum(msgs[perm], row_ids, num_segments=n_rows)
