"""Static-shape edge-batch representation of a relational message graph.

TPU-native replacement for the reference's ``MessageGraph`` sparse incidence
matrices (``code/extras/graph_representations.py:69-147``). XLA wants static
shapes and segment ops, so instead of building V x E ``tf.SparseTensor``s per
step we carry a padded edge list plus precomputed normalization weights:

  * ``forward_incidence_matrix('global') @ messages`` in the reference is a
    sparse softmax of ones per receiver row (== 1/in-degree) followed by SpMM.
    Here that is ``segment_sum(messages * w_fwd, receivers)`` with
    ``w_fwd[e] = 1 / deg_recv[receivers[e]]`` — elementwise identical.
  * 'local' normalization (per (relation, vertex) softmax then relation-sum,
    ``graph_representations.py:95-107``) becomes
    ``w[e] = 1 / count(receivers[e], relations[e])``.
  * 'none' is unit weights.

The 1/degree weights are precomputed host-side (numpy bincount) when the
batch is built: this removes two device scatter passes per layer AND makes
edge-sharded multi-chip aggregation exact — each device segment-sums its
edge shard with globally-correct weights, and a psum over the mesh
reconstitutes the full [V, d] aggregation.

Padding: edges beyond ``n_edges`` point at a phantom vertex row (index
``n_vertices``), so ``segment_sum(..., num_segments=n_vertices + 1)`` drops
them without masking arithmetic in the hot loop.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops.staircase import StaircaseLayout, build_staircase_layout
from .ops.staircase2 import (Staircase2Pair, build_staircase2_pair,
                             build_staircase2_pair_sharded)


class GraphBatch(NamedTuple):
    """A padded, fixed-shape batch of typed directed edges.

    senders/relations/receivers: int32 [E_pad]; padding entries have
    sender == receiver == n_vertices and relation == 0.
    mask: float32 [E_pad], 1.0 for real edges.
    fwd_norm/bwd_norm: float32 [E_pad] aggregation weights (host-
      precomputed 'global' 1/degree by default; None -> compute on device).
    n_vertices: number of real vertices (python int — static under jit).
    n_relations: number of relation types (static).
    """

    senders: jax.Array
    relations: jax.Array
    receivers: jax.Array
    mask: jax.Array
    fwd_norm: Optional[jax.Array]
    bwd_norm: Optional[jax.Array]
    n_vertices: int
    n_relations: int
    # Relation bucketing (for block-diagonal / relation-batched transforms):
    # edges sorted by relation and padded so each fixed-size bucket of
    # ``bucket_size`` consecutive edges carries a single relation
    # (bucket_rel[b]). None -> unbucketed layout.
    bucket_rel: Optional[jax.Array] = None
    bucket_size: Optional[int] = None
    # Optional second copy of the edge arrays in a backward-direction
    # order (sorted by sender). The two aggregation directions share no
    # intermediates, so each can use its own layout: the primary arrays
    # sorted by receiver make the forward scatter sorted, the b_* arrays
    # sorted by sender make the backward scatter sorted (XLA's sorted
    # scatter is ~1.5x faster; measured in benchmarks/scatter_bench.py).
    b_senders: Optional[jax.Array] = None
    b_relations: Optional[jax.Array] = None
    b_receivers: Optional[jax.Array] = None
    b_mask: Optional[jax.Array] = None
    b_norm: Optional[jax.Array] = None
    fwd_sorted: bool = False
    bwd_sorted: bool = False
    # Staircase scatter layouts (ops/staircase.py): the production TPU
    # aggregation path. Built against the PRIMARY edge order; each
    # direction gets its own target-sorted, row-block-aligned layout with
    # the 1/degree weights folded in. None -> XLA segment_sum path.
    sc_fwd: Optional[StaircaseLayout] = None
    sc_bwd: Optional[StaircaseLayout] = None
    # Staircase v2 fused layouts (ops/staircase2.py): gather + relational
    # transform + scatter in one kernel pass per direction (block/basis
    # variants). Each field carries the direction's layout plus its
    # role-swapped twin for the custom VJP. Preferred over sc_fwd/sc_bwd
    # when present.
    sc2_fwd: Optional[Staircase2Pair] = None
    sc2_bwd: Optional[Staircase2Pair] = None

    @property
    def n_padded_edges(self) -> int:
        return self.senders.shape[0]

    @property
    def n_buckets(self) -> Optional[int]:
        if self.bucket_size is None:
            return None
        return self.senders.shape[0] // self.bucket_size


# Register n_vertices / n_relations as static aux data so GraphBatch can
# cross jit boundaries without retracing on array identity.
_ARRAY_FIELDS = ("senders", "relations", "receivers", "mask", "fwd_norm",
                 "bwd_norm", "bucket_rel", "b_senders", "b_relations",
                 "b_receivers", "b_mask", "b_norm", "sc_fwd", "sc_bwd",
                 "sc2_fwd", "sc2_bwd")
_STATIC_FIELDS = ("n_vertices", "n_relations", "bucket_size", "fwd_sorted",
                  "bwd_sorted")

jax.tree_util.register_pytree_node(
    GraphBatch,
    lambda g: (tuple(getattr(g, f) for f in _ARRAY_FIELDS),
               tuple(getattr(g, f) for f in _STATIC_FIELDS)),
    lambda aux, children: GraphBatch(
        **dict(zip(_ARRAY_FIELDS, children)),
        **dict(zip(_STATIC_FIELDS, aux))),
)


def build_graph_batch(triples: np.ndarray, n_vertices: int, n_relations: int,
                      pad_to: Optional[int] = None,
                      normalization: str = "global",
                      bucket_size: Optional[int] = None,
                      shard_align: int = 8,
                      sort_directions: Optional[bool] = None,
                      to_device: bool = True,
                      staircase: bool = False,
                      sc_rb: int = 128, sc_chunk: int = 256,
                      sc_shards: int = 1,
                      staircase2: bool = False,
                      s2_rb: int = 256, s2_chunk: int = 512,
                      s2_k: Optional[int] = None,
                      s2_pad_rows: Optional[bool] = None) -> GraphBatch:
    """Host-side construction of a GraphBatch from an [N, 3] (s, r, o) array.

    ``pad_to`` fixes the edge-array length so that repeated calls with
    varying edge counts hit one compiled executable. ``normalization``
    selects the precomputed aggregation weights ('global' | 'local' |
    'none' | None to defer to the device).

    ``bucket_size``: relation-bucketed layout — edges are sorted by
    relation and each relation's run padded to a multiple of bucket_size,
    so every bucket of consecutive edges has ONE relation (bucket_rel).
    Relation-conditioned transforms then load each relation's weights once
    per bucket instead of once per edge. The padded length is rounded to a
    multiple of ``bucket_size * shard_align`` so the edge axis stays evenly
    shardable across a device mesh.

    ``staircase``: additionally build the per-direction staircase scatter
    layouts (ops/staircase.py — the production TPU aggregation kernel).
    Requires 'global' normalization. Chunk counts are padded to a bound
    that depends only on (pad size, chunk, rb), so repeated builds with
    varying edge counts keep static shapes. ``sc_shards`` builds
    shard-local layouts for edge-partitioned multi-chip execution.

    ``staircase2``: build the v2 FUSED layouts (ops/staircase2.py) —
    gather + relational transform + one-hot scatter in one kernel pass per
    direction, for the block/basis encoder variants. s2_pad_rows=True (the
    default whenever ``pad_to`` is given) pads the grid-row count to a
    bound that is a pure function of (pad size, rb, chunk, k), keeping
    executables static across resampled subgraphs. With ``sc_shards > 1``
    the layouts are built SHARD-LOCAL (one per contiguous edge block,
    concatenated along the leading axis) so the fused kernel runs under an
    edge-partitioned mesh of exactly that size; parallel/mesh.py drops
    layouts whose shard count mismatches the mesh.
    """
    triples = np.asarray(triples, dtype=np.int32).reshape(-1, 3)
    n = triples.shape[0]

    if bucket_size is not None:
        if sort_directions:
            raise ValueError("sort_directions is incompatible with "
                             "relation bucketing")
        return _build_bucketed(triples, n_vertices, n_relations, pad_to,
                               normalization, bucket_size, shard_align,
                               to_device, staircase=staircase, sc_rb=sc_rb,
                               sc_chunk=sc_chunk, sc_shards=sc_shards,
                               staircase2=staircase2, s2_rb=s2_rb,
                               s2_chunk=s2_chunk, s2_k=s2_k,
                               s2_pad_rows=s2_pad_rows
                               if s2_pad_rows is not None
                               else pad_to is not None)
    if sort_directions is None:
        sort_directions = False  # explicit opt-in (RGCNModel.make_graph)

    e_pad = pad_to if pad_to is not None else n
    if e_pad < n:
        raise ValueError(f"pad_to={e_pad} smaller than edge count {n}")

    def lay_out(order: Optional[np.ndarray]):
        t = triples if order is None else triples[order]
        senders = np.full((e_pad,), n_vertices, dtype=np.int32)
        relations = np.zeros((e_pad,), dtype=np.int32)
        receivers = np.full((e_pad,), n_vertices, dtype=np.int32)
        mask = np.zeros((e_pad,), dtype=np.float32)
        senders[:n] = t[:, 0]
        relations[:n] = t[:, 1]
        receivers[:n] = t[:, 2]
        mask[:n] = 1.0
        return senders, relations, receivers, mask

    fwd_order = (np.argsort(triples[:, 2], kind="stable")
                 if sort_directions else None)
    senders, relations, receivers, mask = lay_out(fwd_order)

    fwd = bwd = None
    if normalization is not None:
        fwd = _host_norm(receivers, relations, mask, n_vertices, n_relations,
                         normalization)
        bwd = _host_norm(senders, relations, mask, n_vertices, n_relations,
                         normalization)

    sc_fwd = sc_bwd = None
    if staircase:
        if normalization != "global":
            raise ValueError("staircase layouts require 'global' "
                             "normalization")
        sc_fwd, sc_bwd = _staircase_layouts(
            senders, receivers, fwd, bwd, n_vertices, sc_rb, sc_chunk,
            sc_shards, to_device)

    sc2_fwd = sc2_bwd = None
    if staircase2:
        if normalization != "global":
            raise ValueError("staircase2 layouts require 'global' "
                             "normalization")
        sc2_fwd, sc2_bwd = _staircase2_pairs(
            senders, relations, receivers, fwd, bwd, n_vertices,
            n_relations, s2_rb, s2_chunk, s2_k,
            s2_pad_rows if s2_pad_rows is not None
            else pad_to is not None, to_device, shards=sc_shards)

    dev = jnp.asarray if to_device else (lambda x: x)
    b_arrays = {}
    bwd_sorted = False
    if sort_directions:
        bwd_order = np.argsort(triples[:, 0], kind="stable")
        bs, br, brc, bm = lay_out(bwd_order)
        bnorm = None
        if normalization is not None:
            bnorm = _host_norm(bs, br, bm, n_vertices, n_relations,
                               normalization)
        b_arrays = dict(
            b_senders=dev(bs), b_relations=dev(br),
            b_receivers=dev(brc), b_mask=dev(bm),
            b_norm=None if bnorm is None else dev(bnorm))
        bwd_sorted = True

    return GraphBatch(
        senders=dev(senders),
        relations=dev(relations),
        receivers=dev(receivers),
        mask=dev(mask),
        fwd_norm=None if fwd is None else dev(fwd),
        bwd_norm=None if bwd is None else dev(bwd),
        n_vertices=int(n_vertices),
        n_relations=int(n_relations),
        fwd_sorted=bool(sort_directions),
        bwd_sorted=bwd_sorted,
        sc_fwd=sc_fwd, sc_bwd=sc_bwd,
        sc2_fwd=sc2_fwd, sc2_bwd=sc2_bwd,
        **b_arrays,
    )


def _staircase_layouts(senders, receivers, fwd_norm, bwd_norm, n_vertices,
                       sc_rb, sc_chunk, sc_shards, to_device):
    """Per-direction staircase scatter layouts with a shape bound that is a
    pure function of (pad size, chunk, rb) so executables are reused across
    resampled subgraphs."""
    per = senders.shape[0] // sc_shards
    bound = -(-per // sc_chunk) + -(-n_vertices // sc_rb)
    sc_fwd = build_staircase_layout(
        receivers, fwd_norm, n_vertices, rb=sc_rb, chunk=sc_chunk,
        shards=sc_shards, pad_chunks_to=bound, to_device=to_device)
    sc_bwd = build_staircase_layout(
        senders, bwd_norm, n_vertices, rb=sc_rb, chunk=sc_chunk,
        shards=sc_shards, pad_chunks_to=bound, to_device=to_device)
    return sc_fwd, sc_bwd


def _staircase2_pairs(senders, relations, receivers, fwd_norm, bwd_norm,
                      n_vertices, n_relations, s2_rb, s2_chunk, s2_k,
                      pad_rows, to_device, shards: int = 1):
    """Fused v2 layout pairs for both directions.

    When pad_rows is set, the grid-row count is padded to a bound that is
    a pure function of (edge pad size, n_vertices, rb, chunk, k) — and k
    itself is fixed from the pad size — so repeated builds over resampled
    subgraphs produce identical static shapes (one executable).

    shards > 1 builds SHARD-LOCAL layouts for edge-partitioned mesh
    execution (ops/staircase2.build_staircase2_pair_sharded): per-shard
    bounds are pure functions of the per-shard pad size, and pad_rows is
    forced on (static per-shard shapes are required for concatenation).
    """
    e_pad = senders.shape[0]
    if shards > 1:
        pad_rows = True
        e_pad = e_pad // shards  # bounds below are per shard
    n_blocks = -(-n_vertices // s2_rb)
    # Relation-group size for the fused layouts. group>1 shrinks the
    # kernel's one-hot weight-row matmul and the backward's dW stream by
    # the group factor, but was MEASURED SLOWER end-to-end on v5e
    # (2026-08): strided-group expansion (pltpu.repeat per FMA slice)
    # costs more VPU time than the saved MXU work, run padding inflates
    # S by ~20% at full-graph scale, and the backward's group-major
    # transpose regressed grad time 2.6x. The strided-group kernel path
    # is kept (tested, exact) for architectures where the tradeoff
    # flips; production uses per-slot groups.
    group = 1
    # worst-case slot inflation: each (row-block, relation) run pads to
    # a multiple of `group`. Bound is sample-independent (n_relations,
    # not this sample's max) so resampled subgraphs share shapes.
    n_runs = min(e_pad, n_blocks * max(1, int(n_relations)))
    slot_bound = e_pad + (group - 1) * n_runs
    if s2_k is None:
        if pad_rows:
            # pure function of the PAD size, not the realized edge count
            s2_k = int(np.clip(-(-slot_bound // (s2_chunk * n_blocks)),
                               1, 16))
        else:
            s2_k = 0  # auto per layout (data-dependent is fine unpadded)
    k_arg = s2_k if s2_k > 0 else None
    bound = None
    if pad_rows:
        # rows_b <= padded_b/(k*chunk) + 1 per non-empty block, and
        # sum(padded_b) <= slot_bound.
        bound = n_blocks + -(-slot_bound // (s2_k * s2_chunk))
    if shards > 1:
        sc2_fwd = build_staircase2_pair_sharded(
            senders, relations, receivers, fwd_norm, n_vertices,
            shards=shards, direction="forward", rb=s2_rb, chunk=s2_chunk,
            k=k_arg, group=group, pad_rows_to=bound,
            twin_pad_rows_to=bound, to_device=to_device)
        sc2_bwd = build_staircase2_pair_sharded(
            senders, relations, receivers, bwd_norm, n_vertices,
            shards=shards, direction="backward", rb=s2_rb, chunk=s2_chunk,
            k=k_arg, group=group, pad_rows_to=bound,
            twin_pad_rows_to=bound, to_device=to_device)
        return sc2_fwd, sc2_bwd
    sc2_fwd = build_staircase2_pair(
        senders, relations, receivers, fwd_norm, n_vertices,
        direction="forward", rb=s2_rb, chunk=s2_chunk, k=k_arg,
        group=group, pad_rows_to=bound, twin_pad_rows_to=bound,
        to_device=to_device)
    sc2_bwd = build_staircase2_pair(
        senders, relations, receivers, bwd_norm, n_vertices,
        direction="backward", rb=s2_rb, chunk=s2_chunk, k=k_arg,
        group=group, pad_rows_to=bound, twin_pad_rows_to=bound,
        to_device=to_device)
    return sc2_fwd, sc2_bwd


def bucketed_size(counts: np.ndarray, bucket_size: int) -> int:
    """Total edge slots after padding each relation's count up to a
    multiple of bucket_size."""
    nz = counts[counts > 0]
    return int((-(-nz // bucket_size) * bucket_size).sum())


def _build_bucketed(triples: np.ndarray, n_vertices: int, n_relations: int,
                    pad_to: Optional[int], normalization: Optional[str],
                    bucket_size: int, shard_align: int,
                    to_device: bool = True, staircase: bool = False,
                    sc_rb: int = 128, sc_chunk: int = 256,
                    sc_shards: int = 1, staircase2: bool = False,
                    s2_rb: int = 256, s2_chunk: int = 512,
                    s2_k: Optional[int] = None,
                    s2_pad_rows: bool = False) -> GraphBatch:
    n = triples.shape[0]
    counts = np.bincount(triples[:, 1], minlength=n_relations)
    padded_counts = -(-counts // bucket_size) * bucket_size  # 0 stays 0
    needed = int(padded_counts.sum())

    align = bucket_size * shard_align
    e_pad = pad_to if pad_to is not None else needed
    # If the caller's pad can't hold the bucketed layout, grow it to the
    # next aligned size rather than failing; the shape stays a pure
    # function of the rounded size so executables are still reused.
    e_pad = -(-max(e_pad, needed, align) // align) * align

    offsets = np.zeros(n_relations + 1, dtype=np.int64)
    np.cumsum(padded_counts, out=offsets[1:])

    senders = np.full((e_pad,), n_vertices, dtype=np.int32)
    relations = np.zeros((e_pad,), dtype=np.int32)
    receivers = np.full((e_pad,), n_vertices, dtype=np.int32)
    mask = np.zeros((e_pad,), dtype=np.float32)

    # Rank of each edge within its relation, then place at offset + rank.
    order = np.argsort(triples[:, 1], kind="stable")
    sorted_t = triples[order]
    run_start = np.zeros(n_relations + 1, dtype=np.int64)
    np.cumsum(counts, out=run_start[1:])
    rank = np.arange(n, dtype=np.int64) - run_start[sorted_t[:, 1]]
    pos = offsets[sorted_t[:, 1]] + rank
    senders[pos] = sorted_t[:, 0]
    relations[pos] = sorted_t[:, 1]
    receivers[pos] = sorted_t[:, 2]
    mask[pos] = 1.0

    # Padding slots inside a relation's run still carry that relation id so
    # the whole bucket is single-relation; fully-empty trailing buckets
    # keep relation 0.
    for r in range(n_relations):
        b, e = offsets[r], offsets[r + 1]
        relations[b:e] = r

    n_buckets = e_pad // bucket_size
    bucket_rel = relations.reshape(n_buckets, bucket_size)[:, 0].copy()

    fwd = bwd = None
    if normalization is not None:
        fwd = _host_norm(receivers, relations, mask, n_vertices, n_relations,
                         normalization)
        bwd = _host_norm(senders, relations, mask, n_vertices, n_relations,
                         normalization)

    sc_fwd = sc_bwd = None
    if staircase:
        if normalization != "global":
            raise ValueError("staircase layouts require 'global' "
                             "normalization")
        sc_fwd, sc_bwd = _staircase_layouts(
            senders, receivers, fwd, bwd, n_vertices, sc_rb, sc_chunk,
            sc_shards, to_device)

    sc2_fwd = sc2_bwd = None
    if staircase2:
        if normalization != "global":
            raise ValueError("staircase2 layouts require 'global' "
                             "normalization")
        sc2_fwd, sc2_bwd = _staircase2_pairs(
            senders, relations, receivers, fwd, bwd, n_vertices,
            n_relations, s2_rb, s2_chunk, s2_k, s2_pad_rows, to_device,
            shards=sc_shards)

    dev = jnp.asarray if to_device else (lambda x: x)
    return GraphBatch(
        senders=dev(senders),
        relations=dev(relations),
        receivers=dev(receivers),
        mask=dev(mask),
        fwd_norm=None if fwd is None else dev(fwd),
        bwd_norm=None if bwd is None else dev(bwd),
        n_vertices=int(n_vertices),
        n_relations=int(n_relations),
        bucket_rel=dev(bucket_rel),
        bucket_size=int(bucket_size),
        sc_fwd=sc_fwd, sc_bwd=sc_bwd,
        sc2_fwd=sc2_fwd, sc2_bwd=sc2_bwd,
    )


def _host_norm(targets: np.ndarray, relations: np.ndarray, mask: np.ndarray,
               n_vertices: int, n_relations: int,
               normalization: str) -> np.ndarray:
    """Host (numpy) computation of per-edge aggregation weights."""
    if normalization == "none":
        return mask.copy()
    if normalization == "global":
        deg = np.bincount(targets, weights=mask, minlength=n_vertices + 1)
        return (mask / np.maximum(deg[targets], 1.0)).astype(np.float32)
    if normalization == "local":
        pair = targets.astype(np.int64) * n_relations + relations
        cnt = np.bincount(pair, weights=mask,
                          minlength=(n_vertices + 1) * n_relations)
        return (mask / np.maximum(cnt[pair], 1.0)).astype(np.float32)
    raise ValueError(f"unknown normalization {normalization!r}")


def degree_normalization(graph: GraphBatch, direction: str = "forward",
                         normalization: str = "global") -> jax.Array:
    """Per-edge aggregation weights, matching the reference's incidence-matrix
    normalizations (``graph_representations.py:69-147``).

    Returns the host-precomputed weights when the batch carries them (the
    default, and required for edge-sharded execution where local degree
    counts would be wrong); otherwise computes on device with segment ops.

    direction='forward' normalizes messages delivered to receivers;
    'backward' normalizes messages delivered to senders.
    Returns float32 [E_pad]; padding edges get weight 0.
    """
    if normalization == "global":
        pre = graph.fwd_norm if direction == "forward" else graph.bwd_norm
        if pre is not None:
            return pre

    target = graph.receivers if direction == "forward" else graph.senders

    if normalization == "none":
        return graph.mask

    if normalization == "global":
        # softmax over a row of ones == 1/degree (sparse_softmax of the
        # binary incidence matrix, graph_representations.py:82-93).
        deg = jax.ops.segment_sum(graph.mask, target,
                                  num_segments=graph.n_vertices + 1)
        w = 1.0 / jnp.maximum(deg, 1.0)
        return w[target] * graph.mask

    if normalization == "local":
        # 1 / c_{v,r}: count per (vertex, relation) pair
        # (graph_representations.py:95-107: per-(relation,vertex) sparse
        # softmax then sum over the relation axis).
        n_pairs = (graph.n_vertices + 1) * graph.n_relations
        if n_pairs >= 2 ** 31:
            raise ValueError("local normalization: (V+1)*R overflows int32; "
                             "precompute weights host-side instead")
        pair = target * graph.n_relations + graph.relations
        cnt = jax.ops.segment_sum(graph.mask, pair, num_segments=n_pairs)
        w = 1.0 / jnp.maximum(cnt[pair], 1.0)
        return w * graph.mask

    raise ValueError(f"unknown normalization {normalization!r}")


def aggregate(messages: jax.Array, edge_weights: jax.Array,
              targets: jax.Array, n_vertices: int,
              indices_are_sorted: bool = False) -> jax.Array:
    """Normalized message aggregation: the segment-op equivalent of
    ``tf.sparse_tensor_dense_matmul(incidence, messages)``
    (e.g. ``gcn_basis.py:78-79``).

    messages: [E_pad, d]; edge_weights: [E_pad]; targets: [E_pad] int32 in
    [0, n_vertices] (n_vertices = phantom padding row). Returns [V, d].
    """
    weighted = messages * edge_weights[:, None]
    out = jax.ops.segment_sum(weighted, targets, num_segments=n_vertices + 1,
                              indices_are_sorted=indices_are_sorted)
    return out[:n_vertices]
