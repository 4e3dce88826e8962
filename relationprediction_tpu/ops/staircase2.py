"""Staircase v2: fused gather -> relational transform -> one-hot MXU scatter.

Second-generation production aggregation kernel, replacing ops/staircase.py
on the block/basis hot paths. Round-2 profiling (benchmarks/
staircase_params_bench.py) showed the v1 kernel spends ~6 us per grid step
regardless of tile shape: its output BlockSpec is indexed through a
scalar-prefetch array, which defeats Mosaic's pipeline (every chunk pays a
serialized output fetch/flush). v2 fixes the pipeline and then goes
further, fusing the per-edge relational transform into the kernel so the
[E, d] message stream never exists in HBM:

  * static rectangular grid (grid_row, chunk): all index maps are pure
    functions of the grid position, so Mosaic double-buffers the input
    stream; the output tile is revisited across the inner chunk axis
    (standard matmul-accumulate pattern) and written once per grid row;
  * each grid row holds K chunks of C slots, all targeting ONE 128/256-row
    output block; hot row blocks (power-law degree hubs) get multiple grid
    rows, reconciled by a cheap [n_rows, rb, d] -> [n_blocks, rb, d]
    segment-sum after the kernel (skew never pads the grid);
  * fused modes: 'block' applies the block-diagonal relation transform
    (gcn_block.exp, ``gcn_basis_concat.py:35-52``) inside the kernel — an
    8/16-slot group shares one relation, whose [dr*dr, B] weight tile lives
    in a VMEM-resident stack; 'basis' applies the basis-decomposition
    transform (``gcn_basis.py:39-72``) as a per-chunk MXU contraction with
    the [d_in, B*d_out] basis stack VMEM-resident;
  * the custom VJP runs the SAME kernel on a role-swapped twin layout
    (gather by target, transform by W^T, scatter by source) — no scatter
    op appears anywhere in forward or backward.

The block transform works on a column-permuted "j-major" feature layout
(lane j*B+b holds feature [b*dr+j]) so each of the dr^2 vector FMAs reads a
contiguous B-lane slice; the [V, d] permutation in/out is a vertex-level
lane shuffle costing ~2 x 29 MB per layer at FB15k-237 scale.

Replaces the computation the reference runs through
``tf.sparse_tensor_dense_matmul`` over normalized incidence matrices
(``gcn_basis.py:78-79``, ``gcn_basis_concat.py:69-83``).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class Staircase2Layout(NamedTuple):
    """Host-precomputed slot layout for one scatter pass.

    Slots are grouped into chunks of C, K chunks per grid row; each grid
    row's slots all target one rb-row output block. Within a grid row,
    slots are relation-sorted with runs padded to multiples of ``group``
    (T), so every T-slot group carries a single relation.

    sources:   [S] int32 — vertex whose features feed each slot (pad -> 0).
    slot_tgt:  [S] int32 — target vertex per slot (pad -> v_pad phantom).
    perm:      [S] int32 — primary-order edge position per slot (for
               scatter mode / unfused inputs; pad -> 0).
    weights:   [S] f32   — aggregation weight (0 for pads).
    local_rows:[n_rows*K, 1, C] int32 — target row within the row block
               (rb -> no row).
    group_rel: [S // group] int32 — relation id per T-slot group.
    row_block: [n_rows] int32 — output row-block id per grid row
               (phantom padding rows -> n_blocks).
    rb/chunk/k/group/v_pad/n_blocks: static layout constants.
    direct:    static; True when row r writes block r exactly (n_rows ==
               n_blocks, no splits/padding) so the finishing segment-sum
               can be skipped.
    shards:    static; >1 when the arrays are a leading-axis concatenation
               of per-shard layouts for edge-partitioned mesh execution —
               sharding every array on its leading axis hands each device
               exactly its own shard's layout (slot indices, perm, and
               grid rows are shard-local by construction).
    """

    sources: jax.Array
    slot_tgt: jax.Array
    perm: jax.Array
    weights: jax.Array
    local_rows: jax.Array
    group_rel: jax.Array
    row_block: jax.Array
    rb: int
    chunk: int
    k: int
    group: int
    v_pad: int
    n_blocks: int
    direct: bool
    shards: int = 1

    @property
    def n_slots(self) -> int:
        return self.sources.shape[0]

    @property
    def n_rows(self) -> int:
        return self.row_block.shape[0]

    def slot_rel(self) -> jax.Array:
        """[S] relation id per slot (expanded from the group array).

        Groups are laid out STRIDED within each chunk: group g owns rows
        {g, g + Cg, ..., g + (T-1)·Cg} where Cg = chunk // group — the
        placement that lets the kernel expand per-group weight rows with
        ``pltpu.repeat`` (a tile-concatenate). So slot row r of a chunk
        carries the relation of group r mod Cg.
        """
        if self.group == 1:
            return self.group_rel
        cg = self.chunk // self.group
        n_chunks = self.group_rel.shape[0] // cg
        g2 = self.group_rel.reshape(n_chunks, 1, cg)
        return jnp.broadcast_to(
            g2, (n_chunks, self.group, cg)).reshape(-1)


_S2_ARRAYS = ("sources", "slot_tgt", "perm", "weights", "local_rows",
              "group_rel", "row_block")
_S2_STATIC = ("rb", "chunk", "k", "group", "v_pad", "n_blocks", "direct",
              "shards")

jax.tree_util.register_pytree_node(
    Staircase2Layout,
    lambda s: (tuple(getattr(s, f) for f in _S2_ARRAYS),
               tuple(getattr(s, f) for f in _S2_STATIC)),
    lambda aux, children: Staircase2Layout(
        **dict(zip(_S2_ARRAYS, children)), **dict(zip(_S2_STATIC, aux))),
)


class Staircase2Pair(NamedTuple):
    """Forward scatter layout + its role-swapped twin (used by the VJP)."""

    fwd: Staircase2Layout
    twin: Staircase2Layout


jax.tree_util.register_pytree_node(
    Staircase2Pair,
    lambda p: ((p.fwd, p.twin), None),
    lambda aux, children: Staircase2Pair(*children),
)


def build_staircase2_layout(sources: np.ndarray, relations: np.ndarray,
                            targets: np.ndarray, weights: np.ndarray,
                            n_vertices: int, *, rb: int = 256,
                            chunk: int = 512, k: Optional[int] = None,
                            group: int = 8,
                            pad_rows_to: Optional[int] = None,
                            to_device: bool = True) -> Staircase2Layout:
    """Build one direction's slot layout on the host.

    sources/relations/targets/weights: [E] primary-order edge arrays;
    entries with weight 0 or target >= n_vertices are padding and dropped.
    k: chunks per grid row; None -> ceil(mean chunks per non-empty block),
    clamped to [1, 16].
    pad_rows_to: pad the grid-row count to this bound (static shapes across
    resampled subgraphs); padding rows write the phantom row-block.
    """
    if chunk % group != 0:
        raise ValueError(f"chunk {chunk} not a multiple of group {group}")
    sources = np.asarray(sources, dtype=np.int64)
    relations = np.asarray(relations, dtype=np.int64)
    targets = np.asarray(targets, dtype=np.int64)
    weights = np.asarray(weights, dtype=np.float32)

    n_blocks = -(-n_vertices // rb)
    v_pad = n_blocks * rb
    real = np.nonzero((targets < n_vertices) & (weights != 0.0))[0]
    # Sort edges by (row block, relation) — any order within a block is
    # legal for the scatter (local_rows holds the exact row), so we use the
    # freedom to create single-relation groups for the fused transform.
    blk = targets[real] // rb
    order = real[np.lexsort((relations[real], blk))]
    s_blk = (targets[order] // rb).astype(np.int64)

    # Padded slot count per block: each (block, relation) run pads to a
    # multiple of `group`.
    run_key = s_blk * (relations.max() + 2 if relations.size else 1) \
        + relations[order]
    # run lengths in sorted order
    change = np.nonzero(np.diff(run_key))[0]
    run_ends = np.concatenate([change + 1, [len(order)]]) \
        if len(order) else np.zeros(0, np.int64)
    run_starts = np.concatenate([[0], run_ends[:-1]]) if len(order) \
        else np.zeros(0, np.int64)
    run_lens = run_ends - run_starts
    run_pad = -(-run_lens // group) * group
    run_blk = s_blk[run_starts] if len(order) else np.zeros(0, np.int64)

    padded_per_block = np.zeros(n_blocks, dtype=np.int64)
    np.add.at(padded_per_block, run_blk, run_pad)
    chunks_per_block = -(-padded_per_block // chunk)  # 0 for empty blocks

    if k is None:
        nz = chunks_per_block[chunks_per_block > 0]
        k = int(np.clip(np.ceil(nz.mean()) if nz.size else 1, 1, 16))
    rows_per_block = -(-chunks_per_block // k)
    n_rows = max(int(rows_per_block.sum()), 1)
    direct = bool(n_rows == n_blocks and (rows_per_block == 1).all()
                  and pad_rows_to is None)
    if pad_rows_to is not None:
        if pad_rows_to < n_rows:
            raise ValueError(f"pad_rows_to={pad_rows_to} < required "
                             f"{n_rows}")
        n_rows = pad_rows_to

    S = n_rows * k * chunk
    src = np.zeros(S, dtype=np.int32)
    tgt = np.full(S, v_pad, dtype=np.int32)
    perm = np.zeros(S, dtype=np.int32)
    wts = np.zeros(S, dtype=np.float32)
    lrows = np.full(S, rb, dtype=np.int32)
    grel = np.zeros(S // group, dtype=np.int32)
    row_block = np.full(n_rows, n_blocks, dtype=np.int32)

    # slot position of each edge: lay runs out block-major with group
    # padding, then row boundaries fall every k*chunk slots of a block's
    # padded run (runs/groups never straddle chunks since chunk % group==0
    # and run offsets are group-aligned).
    block_row0 = np.zeros(n_blocks + 1, dtype=np.int64)
    np.cumsum(rows_per_block, out=block_row0[1:])
    # per-run slot offset within its block: runs are block-major sorted, so
    # a cumulative sum minus each block's starting cumsum gives the offset.
    cum = np.concatenate([[0], np.cumsum(run_pad)[:-1]]) \
        if len(run_lens) else np.zeros(0, np.int64)
    if len(run_lens):
        block_first = np.zeros(n_blocks, dtype=np.int64)
        first_idx = np.unique(run_blk, return_index=True)
        block_first[first_idx[0]] = cum[first_idx[1]]
        run_off_in_block = cum - block_first[run_blk]
    else:
        run_off_in_block = np.zeros(0, dtype=np.int64)

    # expand to per-edge positions
    if len(order):
        edge_run = np.repeat(np.arange(len(run_lens)), run_lens)
        rank_in_run = np.arange(len(order)) - run_starts[edge_run]
        off_in_block = run_off_in_block[edge_run] + rank_in_run
        # map block-local padded offset -> global slot
        row_in_block = off_in_block // (k * chunk)
        within_row = off_in_block % (k * chunk)
        grow = block_row0[s_blk] + row_in_block
        pos = grow * (k * chunk) + within_row
        # group id from the CONTIGUOUS offsets (runs/groups never
        # straddle chunks), giving global group slot chunk_seq*Cg + g.
        gpos = pos // group
        grel[gpos] = relations[order].astype(np.int32)
        if group > 1:
            # STRIDED within-chunk placement: group g's T slots sit at
            # rows {g, g+Cg, ...} of its chunk (Cg = chunk // group), so
            # the kernel expands per-group weight rows with the
            # tile-concatenating ``pltpu.repeat``. Any within-block slot
            # order is legal for the scatter (local_rows is per-slot).
            cg = chunk // group
            cpos = pos % chunk
            pos = (pos - cpos) + (cpos % group) * cg + cpos // group
        src[pos] = sources[order].astype(np.int32)
        tgt[pos] = targets[order].astype(np.int32)
        perm[pos] = order.astype(np.int32)
        wts[pos] = weights[order]
        lrows[pos] = (targets[order] - s_blk * rb).astype(np.int32)

    for b in range(n_blocks):
        r0, r1 = block_row0[b], block_row0[b + 1]
        row_block[r0:r1] = b

    dev = jnp.asarray if to_device else (lambda x: x)
    return Staircase2Layout(
        sources=dev(src), slot_tgt=dev(tgt), perm=dev(perm),
        weights=dev(wts),
        local_rows=dev(lrows.reshape(n_rows * k, 1, chunk)),
        group_rel=dev(grel), row_block=dev(row_block),
        rb=rb, chunk=chunk, k=k, group=group, v_pad=v_pad,
        n_blocks=n_blocks, direct=direct)


def build_staircase2_pair(senders: np.ndarray, relations: np.ndarray,
                          receivers: np.ndarray, weights: np.ndarray,
                          n_vertices: int, *, direction: str = "forward",
                          rb: int = 256, chunk: int = 512,
                          k: Optional[int] = None, group: int = 8,
                          pad_rows_to: Optional[int] = None,
                          twin_pad_rows_to: Optional[int] = None,
                          to_device: bool = True) -> Staircase2Pair:
    """Forward + twin layouts for one aggregation direction.

    direction='forward': messages flow sender -> receiver (gather senders,
    scatter to receivers); 'backward': receiver -> sender. The twin swaps
    the roles (used by the VJP to compute d/d_features without a scatter).
    Weights are the per-edge aggregation weights for THIS direction.
    """
    if direction == "forward":
        s, t = senders, receivers
    else:
        s, t = receivers, senders
    fwd = build_staircase2_layout(s, relations, t, weights, n_vertices,
                                  rb=rb, chunk=chunk, k=k, group=group,
                                  pad_rows_to=pad_rows_to,
                                  to_device=to_device)
    twin = build_staircase2_layout(t, relations, s, weights, n_vertices,
                                   rb=rb, chunk=chunk, k=k, group=group,
                                   pad_rows_to=twin_pad_rows_to,
                                   to_device=to_device)
    return Staircase2Pair(fwd=fwd, twin=twin)


def _concat_layouts(layouts) -> Staircase2Layout:
    """Stack per-shard layouts along the leading axis of every array.

    All shards must share identical static fields and per-shard array
    shapes (guaranteed by building each with the same pad bounds). The
    intended execution is under a mesh that shards every array's leading
    axis across exactly ``len(layouts)`` devices — each device then sees
    precisely one shard's layout. UNSHARDED (single-device) execution of
    the concatenated view is ALSO supported and used by the multihost
    eval path (cli.py builds the eval graph with sc_shards=n and a
    mesh-less JittedModelView): it is correct because (a) every shard's
    ``row_block`` holds GLOBAL vertex-block ids, and (b) sharded layouts
    force ``direct=False`` (asserted below), so ``_finish`` reduces rows
    to vertices with a segment_sum that tolerates the non-monotone,
    cross-shard-repeated ``row_block`` stream. Any future ``direct=True``
    fast path or sorted-segments hint must keep this assert.
    """
    first = layouts[0]
    if first.direct:
        raise AssertionError(
            "_concat_layouts requires direct=False per-shard layouts "
            "(build_staircase2_pair_sharded always passes pad bounds, "
            "which force it); a direct concatenated layout would corrupt "
            "unsharded execution in _finish")
    for lo in layouts[1:]:
        for f in _S2_STATIC[:-1]:
            if getattr(lo, f) != getattr(first, f):
                raise ValueError(f"shard layouts disagree on {f}")
        for f in _S2_ARRAYS:
            if getattr(lo, f).shape != getattr(first, f).shape:
                raise ValueError(f"shard layouts disagree on {f} shape")
    arrays = {f: np.concatenate([np.asarray(getattr(lo, f))
                                 for lo in layouts], axis=0)
              for f in _S2_ARRAYS}
    statics = {f: getattr(first, f) for f in _S2_STATIC[:-1]}
    return Staircase2Layout(**arrays, **statics, shards=len(layouts))


def build_staircase2_pair_sharded(senders: np.ndarray,
                                  relations: np.ndarray,
                                  receivers: np.ndarray,
                                  weights: np.ndarray, n_vertices: int, *,
                                  shards: int, direction: str = "forward",
                                  rb: int = 256, chunk: int = 512,
                                  k: Optional[int] = None, group: int = 8,
                                  pad_rows_to: Optional[int] = None,
                                  twin_pad_rows_to: Optional[int] = None,
                                  to_device: bool = True) -> Staircase2Pair:
    """Shard-local fused layouts for edge-partitioned mesh execution.

    The [E_pad] edge arrays are cut into ``shards`` contiguous blocks
    (matching the mesh's edge partitioning of the GraphBatch); each block
    gets its own fwd/twin layout built against the GLOBAL normalization
    weights, padded to identical static bounds, then concatenated so that
    P('edges') sharding hands each device its own layout. Each device's
    kernel pass produces its shard's partial [V, d] aggregation; one psum
    reconstitutes the exact full-graph result (graph.py module notes).
    """
    e_pad = senders.shape[0]
    if e_pad % shards:
        raise ValueError(f"edge pad {e_pad} not divisible by shards "
                         f"{shards}")
    if pad_rows_to is None or twin_pad_rows_to is None:
        raise ValueError("sharded layouts require explicit pad bounds "
                         "(static per-shard shapes)")
    per = e_pad // shards
    fwds, twins = [], []
    for s in range(shards):
        sl = slice(s * per, (s + 1) * per)
        pair = build_staircase2_pair(
            senders[sl], relations[sl], receivers[sl], weights[sl],
            n_vertices, direction=direction, rb=rb, chunk=chunk, k=k,
            group=group, pad_rows_to=pad_rows_to,
            twin_pad_rows_to=twin_pad_rows_to, to_device=False)
        fwds.append(pair.fwd)
        twins.append(pair.twin)
    fwd = _concat_layouts(fwds)
    twin = _concat_layouts(twins)
    if to_device:
        dev = jnp.asarray
        fwd = fwd._replace(**{f: dev(getattr(fwd, f)) for f in _S2_ARRAYS})
        twin = twin._replace(**{f: dev(getattr(twin, f))
                                for f in _S2_ARRAYS})
    return Staircase2Pair(fwd=fwd, twin=twin)


# ---------------------------------------------------------------------------
# j-major lane permutation helpers (block mode)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _jmajor_perm(d: int, n_blocks: int):
    """perm_cols such that x_j = x[:, perm_cols] puts feature (b*dr + j) at
    lane (j*B + b); inv undoes it."""
    dr = d // n_blocks
    perm = np.empty(d, dtype=np.int32)
    for j in range(dr):
        for b in range(n_blocks):
            perm[j * n_blocks + b] = b * dr + j
    inv = np.argsort(perm).astype(np.int32)
    return perm, inv


def to_jmajor(x: jax.Array, n_blocks: int) -> jax.Array:
    perm, _ = _jmajor_perm(x.shape[-1], n_blocks)
    return x[..., perm]


def from_jmajor(x: jax.Array, n_blocks: int) -> jax.Array:
    _, inv = _jmajor_perm(x.shape[-1], n_blocks)
    return x[..., inv]


def blocks_to_jmajor(w: jax.Array) -> jax.Array:
    """[R, B, dr, dr] -> [R, dr*dr, B] with W_j[r, i*dr+j, b] = W[r,b,i,j]."""
    r, b, dr, _ = w.shape
    return jnp.transpose(w, (0, 2, 3, 1)).reshape(r, dr * dr, b)


def blocks_to_jmajor_T(w: jax.Array) -> jax.Array:
    """Transposed-block variant: W_jT[r, j*dr+i, b] = W[r, b, i, j]."""
    r, b, dr, _ = w.shape
    return jnp.transpose(w, (0, 3, 2, 1)).reshape(r, dr * dr, b)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _scatter_body_flat(rows_ref, msgs, out_ref, j):
    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rows = rows_ref[0, 0, :]
    rb = out_ref.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rb, rows.shape[0]), 0)
    onehot = (row_ids == rows[None, :]).astype(msgs.dtype)
    out_ref[...] += jnp.dot(onehot, msgs,
                            preferred_element_type=jnp.float32)


def _scatter_kernel(rows_ref, msgs_ref, out_ref):
    _scatter_body_flat(rows_ref, msgs_ref[...], out_ref, pl.program_id(1))


def _make_block_kernel(n_blocks_w: int, dr: int, n_rels: int, group: int):
    """Fused block-diagonal transform + scatter.

    Per chunk: gather the relation weight ROWS with one MXU matmul at
    GROUP granularity — the layout guarantees every `group` consecutive
    slots share one relation, so Wg[Cg, dr*dr*B] = onehot(group_rel)
    [Cg, R] @ W_flat[R, dr*dr*B] costs `group`x fewer FLOPs than a
    per-slot one-hot (the dominant MXU term of the kernel, see
    docs/ROOFLINE.md §2) — then apply the block transform as dr^2
    full-chunk VPU FMAs on B-lane slices (j-major feature layout) with
    the group axis broadcast in-register, then the one-hot scatter
    matmul. No per-edge weight gathers touch HBM; W_flat stays
    VMEM-resident across the whole grid.
    """
    def kernel(rows_ref, rel_ref, x_ref, w_ref, out_ref, wg_ref, y_ref):
        j = pl.program_id(1)

        rels = rel_ref[0, 0, :]                            # [Cg] int32
        cg = rels.shape[0]
        c = x_ref.shape[0]
        rel_ids = jax.lax.broadcasted_iota(jnp.int32, (cg, n_rels), 1)
        onehot_rel = (rel_ids == rels[:, None]).astype(x_ref.dtype)
        wg_ref[...] = jnp.dot(onehot_rel, w_ref[...],
                              preferred_element_type=jnp.float32
                              ).astype(wg_ref.dtype)

        for i_ in range(dr):
            acc = None
            for j_ in range(dr):
                w_sl = wg_ref[:, (i_ * dr + j_) * n_blocks_w:
                              (i_ * dr + j_ + 1) * n_blocks_w]   # [Cg, B]
                x_sl = x_ref[:, j_ * n_blocks_w:(j_ + 1) * n_blocks_w]
                if group != 1:
                    # strided group placement: row r holds group r % Cg,
                    # exactly pltpu.repeat's tile-concatenate pattern
                    w_sl = pltpu.repeat(w_sl, group, axis=0)  # [C, B]
                t = w_sl * x_sl
                acc = t if acc is None else acc + t
            y_ref[:, i_ * n_blocks_w:(i_ + 1) * n_blocks_w] = acc

        _scatter_body_flat(rows_ref, y_ref[...], out_ref, j)

    return kernel


def _make_basis_kernel(n_bases: int, d_out: int):
    def kernel(rows_ref, x_ref, w_ref, coef_ref, out_ref, t_ref):
        # t = x @ W_flat : [C, B*d_out] on the MXU
        t_ref[...] = jnp.dot(x_ref[...], w_ref[...],
                             preferred_element_type=jnp.float32
                             ).astype(t_ref.dtype)
        y = None
        for b in range(n_bases):
            part = coef_ref[:, b][:, None].astype(t_ref.dtype) \
                * t_ref[:, b * d_out:(b + 1) * d_out]
            y = part if y is None else y + part
        _scatter_body_flat(rows_ref, y, out_ref, pl.program_id(1))

    return kernel


def _finish(out_rows: jax.Array, layout: Staircase2Layout,
            n_vertices: int) -> jax.Array:
    """[n_rows * rb, d] kernel output -> [n_vertices, d]."""
    d = out_rows.shape[-1]
    if layout.direct:
        return out_rows[:n_vertices]
    rows = out_rows.reshape(layout.n_rows, layout.rb * d)
    summed = jax.ops.segment_sum(rows, layout.row_block,
                                 num_segments=layout.n_blocks + 1)
    return summed[:layout.n_blocks].reshape(layout.v_pad, d)[:n_vertices]


def _call_scatter(msgs_sc: jax.Array, layout: Staircase2Layout,
                  interpret: bool) -> jax.Array:
    c, k, rb = layout.chunk, layout.k, layout.rb
    d = msgs_sc.shape[1]
    n_rows = layout.n_rows
    grid_spec = pl.GridSpec(
        grid=(n_rows, k),
        in_specs=[
            pl.BlockSpec((1, 1, c), lambda i, j: (i * k + j, 0, 0)),
            pl.BlockSpec((c, d), lambda i, j: (i * k + j, 0)),
        ],
        out_specs=pl.BlockSpec((rb, d), lambda i, j: (i, 0)),
    )
    out = pl.pallas_call(
        _scatter_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows * rb, d), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * k * rb * c * d, transcendentals=0,
            bytes_accessed=msgs_sc.size * msgs_sc.dtype.itemsize
            + n_rows * rb * d * 4),
    )(layout.local_rows, msgs_sc)
    return out


def _call_block(x_sc: jax.Array, w_j: jax.Array, group_rel: jax.Array,
                layout: Staircase2Layout, interpret: bool) -> jax.Array:
    """x_sc: [S, d] j-major gathered features; w_j: [R, dr*dr, B];
    group_rel: [S // group] relation per slot group."""
    c, k, rb, t = layout.chunk, layout.k, layout.rb, layout.group
    cg = c // t
    d = x_sc.shape[1]
    r, dr2, n_blocks_w = w_j.shape
    dr = int(round(dr2 ** 0.5))
    n_rows = layout.n_rows
    w_flat = w_j.reshape(r, dr2 * n_blocks_w)
    rel2d = group_rel.reshape(-1, 1, cg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_rows, k),
        in_specs=[
            pl.BlockSpec((1, 1, c), lambda i, j: (i * k + j, 0, 0)),
            pl.BlockSpec((1, 1, cg), lambda i, j: (i * k + j, 0, 0)),
            pl.BlockSpec((c, d), lambda i, j: (i * k + j, 0)),
            pl.BlockSpec((r, dr2 * n_blocks_w), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rb, d), lambda i, j: (i, 0)),
        scratch_shapes=[pltpu.VMEM((cg, dr2 * n_blocks_w), x_sc.dtype),
                        pltpu.VMEM((c, d), x_sc.dtype)],
    )
    out = pl.pallas_call(
        _make_block_kernel(n_blocks_w, dr, r, t), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows * rb, d), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * k * (c * rb * d
                                    + cg * r * dr2 * n_blocks_w),
            transcendentals=0,
            bytes_accessed=x_sc.size * x_sc.dtype.itemsize
            + n_rows * rb * d * 4),
    )(layout.local_rows, rel2d, x_sc, w_flat)
    return out


def _call_basis(x_sc: jax.Array, w_flat: jax.Array, coef_sc: jax.Array,
                layout: Staircase2Layout, interpret: bool) -> jax.Array:
    c, k, rb = layout.chunk, layout.k, layout.rb
    d_in = x_sc.shape[1]
    n_bases = coef_sc.shape[1]
    d_out = w_flat.shape[1] // n_bases
    n_rows = layout.n_rows
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_rows, k),
        in_specs=[
            pl.BlockSpec((1, 1, c), lambda i, j: (i * k + j, 0, 0)),
            pl.BlockSpec((c, d_in), lambda i, j: (i * k + j, 0)),
            pl.BlockSpec((d_in, n_bases * d_out), lambda i, j: (0, 0)),
            pl.BlockSpec((c, n_bases), lambda i, j: (i * k + j, 0)),
        ],
        out_specs=pl.BlockSpec((rb, d_out), lambda i, j: (i, 0)),
        scratch_shapes=[pltpu.VMEM((c, n_bases * d_out), x_sc.dtype)],
    )
    out = pl.pallas_call(
        _make_basis_kernel(n_bases, d_out), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows * rb, d_out), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * k * c * (rb * d_out + d_in * n_bases * d_out),
            transcendentals=0,
            bytes_accessed=x_sc.size * x_sc.dtype.itemsize
            + n_rows * rb * d_out * 4),
    )(layout.local_rows, x_sc, w_flat, coef_sc)
    return out


# ---------------------------------------------------------------------------
# Public ops
# ---------------------------------------------------------------------------

def scatter2(msgs: jax.Array, layout: Staircase2Layout, n_vertices: int,
             interpret: bool = False, compute_dtype=None) -> jax.Array:
    """Pure scatter: out[v] = sum_e w_e * msgs[e] [target_e == v], with
    msgs in PRIMARY edge order (permutation fused into the weight-multiply
    gather). Differentiable via the standard gather VJP."""
    msgs_sc = jnp.take(msgs, layout.perm % msgs.shape[0], axis=0) \
        * layout.weights[:, None]
    if compute_dtype is not None:
        msgs_sc = msgs_sc.astype(compute_dtype)
    out = _call_scatter(msgs_sc, layout, interpret)
    return _finish(out, layout, n_vertices)


def scatter2_slot_order(msgs_sc: jax.Array, layout: Staircase2Layout,
                        n_vertices: int, interpret: bool = False
                        ) -> jax.Array:
    """Scatter of messages ALREADY in slot order (weights pre-applied)."""
    return _finish(_call_scatter(msgs_sc, layout, interpret), layout,
                   n_vertices)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def block_direction(features: jax.Array, blocks: jax.Array,
                    pair: Staircase2Pair, n_blocks_w: int,
                    n_vertices: int, interpret: bool = False,
                    compute_dtype=None) -> jax.Array:
    """Fused block-diagonal direction aggregation:

      out[v] = sum_e w_e * blockdiag(blocks[r_e]) @ features[src_e]
               over edges e with target v.

    features: [V, d] (standard b-major layout); blocks: [R, B, dr, dr].
    Returns [n_vertices, d] f32. Both the forward and backward passes are
    single fused kernel passes (gather -> transform -> one-hot scatter).
    """
    return _block_direction_fwd_impl(features, blocks, pair, n_blocks_w,
                                     n_vertices, interpret, compute_dtype)


def _block_direction_fwd_impl(features, blocks, pair, n_blocks_w,
                              n_vertices, interpret, compute_dtype):
    layout = pair.fwd
    feats_j = to_jmajor(features, n_blocks_w)
    w_j = blocks_to_jmajor(blocks)
    if compute_dtype is not None:
        # Cast the [V, d] table BEFORE the slot gather: the gather then
        # reads S*d*2 bytes instead of S*d*4 — the roofline's item-2 lever
        # (docs/ROOFLINE.md §3; the one-time table cast costs V*d*(4+2)).
        feats_j = feats_j.astype(compute_dtype)
        w_j = w_j.astype(compute_dtype)
        weights = layout.weights.astype(compute_dtype)
    else:
        weights = layout.weights
    x_sc = jnp.take(feats_j, layout.sources, axis=0) * weights[:, None]
    out_j = _finish(_call_block(x_sc, w_j, layout.group_rel, layout,
                                interpret), layout, n_vertices)
    return from_jmajor(out_j, n_blocks_w)


def _block_direction_bwd_impl(pair, n_blocks_w, n_vertices, interpret,
                              compute_dtype, res, g):
    features, blocks = res
    layout, twin = pair.fwd, pair.twin
    g_j = to_jmajor(g, n_blocks_w)
    dr = features.shape[1] // n_blocks_w

    # --- d features: same fused kernel on the twin layout with W^T -------
    # dL/dx[u] = sum_{e: src_e = u} w_e * blocks[r_e]^T @ g[tgt_e]
    g_pad = jnp.concatenate(
        [g_j, jnp.zeros((twin.v_pad - n_vertices + 1, g_j.shape[1]),
                        g_j.dtype)], axis=0)
    w_jT = blocks_to_jmajor_T(blocks)
    if compute_dtype is not None:
        # Cast the cotangent table before the gather (same table-cast
        # lever as the forward; halves the twin gather's read traffic).
        g_pad_c = g_pad.astype(compute_dtype)
        w_jT = w_jT.astype(compute_dtype)
        tw = twin.weights.astype(compute_dtype)
    else:
        g_pad_c, tw = g_pad, twin.weights
    gx_sc = jnp.take(g_pad_c, jnp.minimum(twin.sources, twin.v_pad),
                     axis=0) * tw[:, None]
    dfeats_j = _finish(_call_block(gx_sc, w_jT, twin.group_rel, twin,
                                   interpret), twin, features.shape[0])
    dfeats = from_jmajor(dfeats_j, n_blocks_w)

    # --- d blocks: one-hot MXU reduction over slots ---------------------
    # dW_j[r, i*dr+j, b] = sum_{e in r} w_e g_j[tgt_e, i*B+b]
    #                                       x_j[src_e, j*B+b]
    # Contract the slot axis on the MXU per output row i:
    #   dW_i[r, j, b] = onehot(slot_rel)^T [R, S] @ (g_i * x)[S, j, b]
    # — the elementwise product fuses into the matmul input, so the
    # [S, dr^2, B] outer-product tensor of the naive formulation never
    # materializes (4x faster measured; the backward's former dominant
    # HBM term, docs/ROOFLINE.md §4).
    n_slots = layout.n_slots
    n_rels = blocks.shape[0]
    cd = compute_dtype if compute_dtype is not None else jnp.float32
    if interpret:
        # CPU dot thunks don't support BF16 x BF16 -> F32 accumulation;
        # the interpret/test path contracts in f32.
        cd = jnp.float32
    feats_j = to_jmajor(features, n_blocks_w).astype(cd)
    x_sc = jnp.take(feats_j, layout.sources, axis=0)
    gw_sc = jnp.take(g_pad.astype(cd),
                     jnp.minimum(layout.slot_tgt, layout.v_pad),
                     axis=0) * layout.weights.astype(cd)[:, None]
    xg = x_sc.reshape(n_slots, dr, n_blocks_w)
    t_grp = layout.group
    if t_grp > 1:
        # Group-structured reduction: the strided placement puts group
        # g's T slots at chunk rows {g, g + Cg, ...}, so a contiguous
        # [n_chunks, T, Cg] reshape + sum over T collapses each
        # single-relation group BEFORE the one-hot contraction — T x
        # fewer MXU rows and no per-slot relation expansion (the
        # expansion+transpose was the round-3 grouped backward's 2.6x
        # regression).
        cg = layout.chunk // t_grp
        n_chunks = n_slots // layout.chunk
        onehot = (layout.group_rel[:, None]
                  == jnp.arange(n_rels, dtype=jnp.int32)[None, :]
                  ).astype(cd)                           # [Sg, R]

        def contract(p):                                 # p: [S, dr, B]
            pg = p.reshape(n_chunks, t_grp, cg, dr, n_blocks_w) \
                  .sum(axis=1).reshape(-1, dr, n_blocks_w)
            return jnp.einsum("sr,sjb->rjb", onehot, pg,
                              preferred_element_type=jnp.float32)
    else:
        onehot = (layout.slot_rel()[:, None]
                  == jnp.arange(n_rels, dtype=jnp.int32)[None, :]
                  ).astype(cd)

        def contract(p):
            return jnp.einsum("sr,sjb->rjb", onehot, p,
                              preferred_element_type=jnp.float32)

    dw_i = []
    for i_ in range(dr):
        p = gw_sc[:, i_ * n_blocks_w:(i_ + 1) * n_blocks_w][:, None, :] \
            * xg                                         # [S, dr, B]
        dw_i.append(contract(p))
    dw_j = jnp.stack(dw_i, axis=1)                       # [R, dr, dr, B]
    dblocks = jnp.transpose(dw_j, (0, 3, 1, 2)).astype(blocks.dtype)
    return dfeats.astype(features.dtype), dblocks


def _block_bwd(n_blocks_w, n_vertices, interpret, compute_dtype, res, g):
    features, blocks, pair = res
    dfeats, dblocks = _block_direction_bwd_impl(
        pair, n_blocks_w, n_vertices, interpret, compute_dtype,
        (features, blocks), g)
    return dfeats, dblocks, None


def _block_fwd(features, blocks, pair, n_blocks_w, n_vertices, interpret,
               compute_dtype):
    out = _block_direction_fwd_impl(features, blocks, pair, n_blocks_w,
                                    n_vertices, interpret, compute_dtype)
    return out, (features, blocks, pair)


block_direction.defvjp(_block_fwd, _block_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def basis_direction(features: jax.Array, w_flat: jax.Array,
                    coefficients: jax.Array, pair: Staircase2Pair,
                    n_bases: int, n_vertices: int, interpret: bool = False,
                    compute_dtype=None) -> jax.Array:
    """Fused basis-decomposition direction aggregation:

      out[v] = sum_e w_e * sum_b C[r_e, b] * (features[src_e] @ W_b)
               over edges e with target v.

    features: [V, d_in]; w_flat: [d_in, B*d_out]; coefficients: [R, B].
    """
    return _basis_fwd_impl(features, w_flat, coefficients, pair, n_bases,
                           n_vertices, interpret, compute_dtype)


def _basis_fwd_impl(features, w_flat, coefficients, pair, n_bases,
                    n_vertices, interpret, compute_dtype):
    layout = pair.fwd
    feats = features
    w = w_flat
    weights = layout.weights
    if compute_dtype is not None:
        # Table cast before the slot gather (halved read traffic).
        feats = feats.astype(compute_dtype)
        w = w.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
    x_sc = jnp.take(feats, layout.sources, axis=0) * weights[:, None]
    coef_sc = jnp.take(coefficients, layout.slot_rel(), axis=0)
    if compute_dtype is not None:
        coef_sc = coef_sc.astype(compute_dtype)
    out = _finish(_call_basis(x_sc, w, coef_sc, layout, interpret), layout,
                  n_vertices)
    return out


def _basis_fwd(features, w_flat, coefficients, pair, n_bases, n_vertices,
               interpret, compute_dtype):
    out = _basis_fwd_impl(features, w_flat, coefficients, pair, n_bases,
                          n_vertices, interpret, compute_dtype)
    return out, (features, w_flat, coefficients, pair)


def _basis_bwd(n_bases, n_vertices, interpret, compute_dtype, res, g):
    features, w_flat, coefficients, pair = res
    layout, twin = pair.fwd, pair.twin
    d_in = features.shape[1]
    d_out = g.shape[1]

    g_pad = jnp.concatenate(
        [g, jnp.zeros((twin.v_pad - n_vertices + 1, d_out), g.dtype)],
        axis=0)

    # d features: twin pass with the per-basis TRANSPOSED stacks.
    # dx[u] = sum_e w_e sum_b C[r_e, b] * (g[tgt_e] @ W_b^T)
    w_t = jnp.transpose(
        w_flat.reshape(d_in, n_bases, d_out), (2, 1, 0)
    ).reshape(d_out, n_bases * d_in)
    wt = w_t
    g_src = g_pad
    tw = twin.weights
    if compute_dtype is not None:
        g_src = g_src.astype(compute_dtype)
        wt = wt.astype(compute_dtype)
        tw = tw.astype(compute_dtype)
    gx_sc = jnp.take(g_src, jnp.minimum(twin.sources, twin.v_pad),
                     axis=0) * tw[:, None]
    coef_tw = jnp.take(coefficients, twin.slot_rel(), axis=0)
    if compute_dtype is not None:
        coef_tw = coef_tw.astype(compute_dtype)
    dfeats = _finish(_call_basis(gx_sc, wt, coef_tw, twin, interpret),
                     twin, features.shape[0])

    # dW / dC in XLA over slot arrays (training-scale S).
    x_sc = jnp.take(features, layout.sources, axis=0)
    gw_sc = jnp.take(g_pad, jnp.minimum(layout.slot_tgt, layout.v_pad),
                     axis=0) * layout.weights[:, None]
    coef_sc = jnp.take(coefficients, layout.slot_rel(), axis=0)
    # dW_b = sum_s coef[s, b] * x_s (outer) gw_s
    #   -> [d_in, B, d_out] via B matmuls
    dw = jnp.einsum("si,sb,so->ibo", x_sc, coef_sc, gw_sc)
    dw_flat = dw.reshape(d_in, n_bases * d_out).astype(w_flat.dtype)
    # dC[r, b] = sum_{s in r} <t_s[b], gw_s>, t = x @ W_flat
    t_sc = jnp.dot(x_sc, w_flat,
                   preferred_element_type=jnp.float32
                   ).reshape(-1, n_bases, d_out)
    dots = jnp.einsum("sbo,so->sb", t_sc, gw_sc)
    dc = jax.ops.segment_sum(dots, layout.slot_rel(),
                             num_segments=coefficients.shape[0]
                             ).astype(coefficients.dtype)
    return dfeats.astype(features.dtype), dw_flat, dc, None


basis_direction.defvjp(_basis_fwd, _basis_bwd)


def default_interpret() -> bool:
    """Compiled Mosaic on TPU backends, interpreter elsewhere (CPU tests)."""
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# Oracle (XLA) reference implementations for tests
# ---------------------------------------------------------------------------

def scatter2_xla(msgs: jax.Array, layout: Staircase2Layout,
                 n_vertices: int) -> jax.Array:
    msgs_sc = jnp.take(msgs, layout.perm % msgs.shape[0], axis=0) \
        * layout.weights[:, None]
    out = jax.ops.segment_sum(
        msgs_sc, jnp.minimum(layout.slot_tgt, layout.v_pad),
        num_segments=layout.v_pad + 1)
    return out[:n_vertices]
