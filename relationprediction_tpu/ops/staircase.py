"""Staircase SpMM: TPU-native sorted segment-sum via one-hot MXU matmuls.

This is the production relational-aggregation kernel — the replacement for
the reference's ``tf.sparse_tensor_dense_matmul`` over the normalized
incidence matrix (``gcn_basis.py:78-79``, ``gcn_basis_concat.py:69-83``) and
for XLA's ``segment_sum`` lowering (which runs the [E, 500] workloads of
this framework at <100 GB/s effective on TPU; benchmarks/layer_profile.py).

Key idea: with edges sorted by target vertex, the [V, E] incidence matrix is
a *staircase* — cutting the edge axis into chunks of C edges, every chunk's
nonzero rows fall inside one RB-row window. The host lays edges out so no
chunk crosses a row-block boundary (padding slots carry weight 0); each
chunk then contributes ``onehot([RB, C]) @ msgs([C, D])`` — a dense MXU
matmul — accumulated into a VMEM-resident output block. The one-hot carries
the per-edge aggregation weight, so normalization is fused into the matmul.

The layout also fuses the *permutation* from the primary edge order (e.g.
relation-bucketed for the block-diagonal transform) into the message gather:
``take(msgs_primary, perm)`` feeds the kernel, and the custom VJP turns the
backward pass into a row gather by target id (monotone) times the edge
weight — no scatter appears anywhere in the backward pass.

All shapes are static; everything is 8/128-aligned; no per-row DMAs (the
round-1 kernel design Mosaic rejected).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class StaircaseLayout(NamedTuple):
    """Host-precomputed scatter layout for one aggregation direction.

    perm:       [S] int32   — primary-order edge position feeding each
                              staircase slot (padding slots -> 0).
    local_rows: [n_chunks, 1, C] int32 — target row within the chunk's row
                              block; padding slots carry RB (matches no row).
                              (The unit middle dim makes the (1, 1, C)
                              BlockSpec legal for Mosaic: the last two block
                              dims equal the array dims.)
    weights:    [n_chunks, C] f32 — aggregation weight per slot (0 for pad).
    chunk_rb:   [n_chunks] int32 — output row block of each chunk
                              (non-decreasing within a shard).
    bwd_targets:[E_primary] int32 — target vertex per primary edge (for the
                              VJP gather; phantom edges -> v_pad row).
    bwd_weights:[E_primary] f32 — weight per primary edge (0 for phantom).
    rb, chunk:  static block/chunk sizes.
    v_pad:      static padded vertex count (n_row_blocks * rb).
    shards:     static shard count (leading axes divide evenly by it).
    """

    perm: jax.Array
    local_rows: jax.Array
    weights: jax.Array
    chunk_rb: jax.Array
    bwd_targets: jax.Array
    bwd_weights: jax.Array
    rb: int
    chunk: int
    v_pad: int
    shards: int

    @property
    def n_chunks(self) -> int:
        return self.chunk_rb.shape[0]


_SC_ARRAYS = ("perm", "local_rows", "weights", "chunk_rb", "bwd_targets",
              "bwd_weights")
_SC_STATIC = ("rb", "chunk", "v_pad", "shards")

jax.tree_util.register_pytree_node(
    StaircaseLayout,
    lambda s: (tuple(getattr(s, f) for f in _SC_ARRAYS),
               tuple(getattr(s, f) for f in _SC_STATIC)),
    lambda aux, children: StaircaseLayout(
        **dict(zip(_SC_ARRAYS, children)), **dict(zip(_SC_STATIC, aux))),
)


def build_staircase_layout(targets: np.ndarray, weights: np.ndarray,
                           n_vertices: int, *, rb: int = 128,
                           chunk: int = 256, shards: int = 1,
                           pad_chunks_to: Optional[int] = None,
                           to_device: bool = True) -> StaircaseLayout:
    """Build the scatter layout on the host (numpy).

    targets: [E] int32 target vertex per primary-order edge; entries equal
      to ``n_vertices`` (the phantom padding row) are dropped.
    weights: [E] f32 per-edge aggregation weight in primary order (the
      host-precomputed 1/degree normalization; 0 for padding edges).
    shards: build an independent staircase per contiguous edge shard (the
      edge-partitioned mesh layout) so each device's kernel only references
      its local shard; per-shard chunk counts are padded to a common size.
    """
    targets = np.asarray(targets, dtype=np.int64)
    weights = np.asarray(weights, dtype=np.float32)
    e = targets.shape[0]
    if e % shards != 0:
        raise ValueError(f"edge count {e} not divisible by shards={shards}")
    per = e // shards
    n_blocks = -(-n_vertices // rb)
    v_pad = n_blocks * rb

    shard_data = []
    for s in range(shards):
        lo = s * per
        t = targets[lo:lo + per]
        w = weights[lo:lo + per]
        real = np.nonzero((t < n_vertices) & (w != 0.0))[0]
        order = real[np.argsort(t[real], kind="stable")]
        st = t[order]
        blocks = st // rb
        # edges per row block; every block needs >= 1 chunk so its output
        # tile gets zero-initialized.
        cnt = np.bincount(blocks, minlength=n_blocks)
        chunks_per_block = np.maximum(-(-cnt // chunk), 1)
        n_chunks = int(chunks_per_block.sum())
        slots = n_chunks * chunk

        perm = np.zeros(slots, dtype=np.int32)
        lrows = np.full(slots, rb, dtype=np.int32)
        wts = np.zeros(slots, dtype=np.float32)
        chunk_rb = np.repeat(np.arange(n_blocks, dtype=np.int32),
                             chunks_per_block)

        # slot offset of each block's run
        block_slot0 = np.zeros(n_blocks + 1, dtype=np.int64)
        np.cumsum(chunks_per_block * chunk, out=block_slot0[1:])
        # rank of each sorted edge within its block
        edge_block_start = np.zeros(n_blocks + 1, dtype=np.int64)
        np.cumsum(cnt, out=edge_block_start[1:])
        rank = np.arange(len(order)) - edge_block_start[blocks]
        pos = block_slot0[blocks] + rank
        # GLOBAL edge position. At use time the kernel takes
        # ``perm % msgs.shape[0]``: a no-op when executed on the full edge
        # array, and exactly the shard-local index when executed inside
        # shard_map (shard s's perm values all lie in [s*per, (s+1)*per)).
        perm[pos] = (lo + order).astype(np.int32)
        lrows[pos] = (st - blocks * rb).astype(np.int32)
        wts[pos] = w[order]
        shard_data.append((perm, lrows, wts, chunk_rb, n_chunks))

    max_chunks = max(d[4] for d in shard_data)
    if pad_chunks_to is not None:
        if pad_chunks_to < max_chunks:
            raise ValueError(f"pad_chunks_to={pad_chunks_to} < required "
                             f"{max_chunks}")
        max_chunks = pad_chunks_to
    perms, lrowss, wtss, rbs = [], [], [], []
    for perm, lrows, wts, chunk_rb, n_chunks in shard_data:
        extra = max_chunks - n_chunks
        # padding chunks re-target the last row block with zero weight
        perms.append(np.concatenate(
            [perm, np.zeros(extra * chunk, np.int32)]))
        lrowss.append(np.concatenate(
            [lrows, np.full(extra * chunk, rb, np.int32)]))
        wtss.append(np.concatenate([wts, np.zeros(extra * chunk,
                                                  np.float32)]))
        rbs.append(np.concatenate(
            [chunk_rb, np.full(extra, n_blocks - 1, np.int32)]))

    bwd_targets = np.minimum(targets, n_vertices).astype(np.int32)
    bwd_targets[weights == 0.0] = v_pad  # phantom -> zero row of padded out
    bwd_targets[bwd_targets >= n_vertices] = v_pad

    dev = jnp.asarray if to_device else (lambda x: x)
    return StaircaseLayout(
        perm=dev(np.concatenate(perms)),
        local_rows=dev(
            np.concatenate(lrowss).reshape(shards * max_chunks, 1, chunk)),
        weights=dev(
            np.concatenate(wtss).reshape(shards * max_chunks, chunk)),
        chunk_rb=dev(np.concatenate(rbs)),
        bwd_targets=dev(bwd_targets),
        bwd_weights=dev(weights),
        rb=rb, chunk=chunk, v_pad=v_pad, shards=shards)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _staircase_kernel(chunk_rb_ref, rows_ref, msgs_ref, out_ref):
    c = pl.program_id(0)
    rb = out_ref.shape[0]

    # Branchless first-visit test (Mosaic miscompiles bool-valued lax.cond):
    # at c == 0 prev aliases the current entry, so the (c == 0) term forces
    # the zero-init.
    prev = chunk_rb_ref[jnp.maximum(c - 1, 0)]
    first = (c == 0) | (chunk_rb_ref[c] != prev)

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # Binary one-hot (weights are folded into the messages at the permute
    # stage, so the one-hot is exact in any dtype, including bf16).
    rows = rows_ref[0, 0, :]                                # [C] int32
    row_ids = jax.lax.broadcasted_iota(jnp.int32,
                                       (rb, rows.shape[0]), 0)
    onehot = (row_ids == rows[None, :]).astype(msgs_ref.dtype)
    out_ref[...] += jnp.dot(onehot, msgs_ref[...],
                            preferred_element_type=jnp.float32)


def _staircase_call(msgs_sc: jax.Array, layout: StaircaseLayout,
                    interpret: bool) -> jax.Array:
    n_chunks = layout.n_chunks
    c = layout.chunk
    rb = layout.rb
    d = msgs_sc.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # chunk_rb
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, c), lambda i, rb_ref: (i, 0, 0)),
            pl.BlockSpec((c, d), lambda i, rb_ref: (i, 0)),
        ],
        out_specs=pl.BlockSpec((rb, d), lambda i, rb_ref: (rb_ref[i], 0)),
    )
    flops = 2 * n_chunks * rb * c * d
    return pl.pallas_call(
        _staircase_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((layout.v_pad, d), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=0,
            bytes_accessed=msgs_sc.size * msgs_sc.dtype.itemsize
            + layout.v_pad * d * 4),
    )(layout.chunk_rb, layout.local_rows, msgs_sc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def staircase_aggregate(msgs: jax.Array, layout: StaircaseLayout,
                        n_vertices: int, interpret: bool = False,
                        compute_dtype=None) -> jax.Array:
    """out[v] = sum over primary edges e with target v of
    ``layout.bwd_weights[e] * msgs[e]`` — the normalized aggregation
    (``graph_lib.aggregate`` semantics), computed by the staircase kernel.

    msgs: [E_primary, D] messages in primary edge order.
    compute_dtype: optional lower-precision dtype (e.g. jnp.bfloat16) for
      the permuted message stream and the one-hot matmul — halves the
      kernel's HBM traffic; accumulation stays f32.
    Returns [n_vertices, D] f32.
    """
    # Fused permute + weight: one XLA gather with the multiply fused in.
    # perm stores GLOBAL positions; mod maps them to this execution's local
    # edge array (identity single-chip, shard-local under shard_map).
    msgs_sc = jnp.take(msgs, layout.perm % msgs.shape[0], axis=0) \
        * layout.weights.reshape(-1)[:, None]
    if compute_dtype is not None:
        msgs_sc = msgs_sc.astype(compute_dtype)
    out = _staircase_call(msgs_sc, layout, interpret)
    return out[:n_vertices]


def _staircase_fwd(msgs, layout, n_vertices, interpret, compute_dtype):
    return (staircase_aggregate(msgs, layout, n_vertices, interpret,
                                compute_dtype), (layout,))


def _staircase_bwd(n_vertices, interpret, compute_dtype, res, g):
    (layout,) = res
    # d/dmsgs of sum_e w_e <g[t_e], msgs[e]> = w_e * g[t_e]: a monotone row
    # gather by target id — no scatter in the backward pass.
    g_pad = jnp.concatenate(
        [g, jnp.zeros((layout.v_pad + 1 - n_vertices, g.shape[1]),
                      g.dtype)], axis=0)
    g_msgs = jnp.take(g_pad, layout.bwd_targets, axis=0)
    return (g_msgs * layout.bwd_weights[:, None], None)


staircase_aggregate.defvjp(_staircase_fwd, _staircase_bwd)


def default_interpret() -> bool:
    """Run the kernel in interpreter mode off-TPU (CPU tests/virtual
    meshes); compiled Mosaic on real TPU backends (incl. tunneled ones)."""
    return jax.default_backend() == "cpu"


def staircase_aggregate_xla(msgs: jax.Array, layout: StaircaseLayout,
                            n_vertices: int) -> jax.Array:
    """XLA reference implementation (oracle + non-TPU fallback)."""
    out = jax.ops.segment_sum(
        msgs * layout.bwd_weights[:, None],
        layout.bwd_targets, num_segments=layout.v_pad + 1)
    return out[:n_vertices]
