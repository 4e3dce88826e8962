"""Vertex-sharded multi-chip execution (memory-scalable variant).

The default edge-partitioned step (``parallel/mesh.py``) replicates the
[V, d] activation matrix and psums partial aggregations — ideal for
KG-scale vertex counts (FB15k: 30 MB of activations). For graphs whose
entity table or activations exceed one chip's HBM, this module shards the
VERTEX dimension instead:

  * the entity-embedding / input-transform table is sharded over rows:
    each device owns V/n vertices' parameters AND activations;
  * edges are partitioned by *destination* shard (the graph analogue of
    the (relation, destination) partitioning in BASELINE.json): each
    device holds the edges whose aggregation target it owns;
  * per layer, each device fetches exactly the SOURCE vertex rows its
    edges reference via a **targeted halo exchange**: host-precomputed
    per-(owner, consumer) boundary row lists, shipped with ONE
    ``all_to_all`` over the mesh axis (``halo="targeted"``, the default).
    ``halo="all_gather"`` keeps the exchange-everything fallback;
  * aggregation then runs purely locally into the owned vertex rows —
    no psum needed — and activations stay sharded between layers;
  * the training loss gathers decoder entity codes through a second halo
    exchange keyed on the loss batch's subject/object ids, so gradients
    flow back through ``all_to_all`` into the sharded entity table.

Exact numerics: identical math to single-chip, just a different layout
(tests/test_vertex_sharded.py asserts allclose parity for the basis and
block variants, encode and loss+grad).

Supported encoders: gcn_{basis,block,diag,basis_plus_diag,
basis_times_diag} with a dense input transform and no skip connections.
(The reference's shipped GCN configs all use an input transform —
``gcn_basis.exp``/``gcn_block.exp``; skip connections and the variational
stage remain edge-partitioned-only.)

Train-mode note: the self-loop dropout mask is drawn PER SHARD by default
(``dropout_mode='per_shard'``: an O(rows_per x d) mask from the step rng
folded with the shard index — same distribution as single-chip, different
stream), so training never allocates O(V x d) per chip. The
``'full_parity'`` mode draws the single-chip [V, d] mask and row-slices it
for the bit-exact parity tests only.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from ..models import decoders as decoders_lib
from ..models import encoders as enc
from ..models.build import RGCNModel
from .mesh import EDGE_AXIS


def _round_up(n: int, k: int) -> int:
    return -(-n // k) * k


def partition_edges_by_destination(triples: np.ndarray, n_vertices: int,
                                   n_shards: int, pad_to: int,
                                   n_relations: int):
    """Host-side destination partitioning: shard s owns vertices
    [s*ceil(V/n), (s+1)*ceil(V/n)) and receives the edges whose receiver
    (forward) / sender (backward) it owns. Returns per-shard stacked
    GraphBatch arrays [n_shards, E_pad] ready for shard_map.

    Normalization weights are global (computed over the full edge set), so
    local aggregation is exact.
    """
    triples = np.asarray(triples, dtype=np.int32)
    rows_per = -(-n_vertices // n_shards)

    fwd_shard = triples[:, 2] // rows_per
    bwd_shard = triples[:, 0] // rows_per

    def pack(shard_ids, order_col):
        out = []
        for s in range(n_shards):
            mine = triples[shard_ids == s]
            mine = mine[np.argsort(mine[:, order_col], kind="stable")]
            if len(mine) > pad_to:
                raise ValueError(f"shard {s} has {len(mine)} edges > "
                                 f"pad_to {pad_to}")
            out.append(mine)
        return out

    fwd_parts = pack(fwd_shard, 2)
    bwd_parts = pack(bwd_shard, 0)

    # Global degree weights (1/deg over the FULL graph).
    deg_in = np.bincount(triples[:, 2], minlength=n_vertices + 1)
    deg_out = np.bincount(triples[:, 0], minlength=n_vertices + 1)

    def arrays(parts, deg, target_col):
        sen = np.full((n_shards, pad_to), n_vertices, np.int32)
        rel = np.zeros((n_shards, pad_to), np.int32)
        rec = np.full((n_shards, pad_to), n_vertices, np.int32)
        msk = np.zeros((n_shards, pad_to), np.float32)
        nrm = np.zeros((n_shards, pad_to), np.float32)
        for s, mine in enumerate(parts):
            m = len(mine)
            sen[s, :m] = mine[:, 0]
            rel[s, :m] = mine[:, 1]
            rec[s, :m] = mine[:, 2]
            msk[s, :m] = 1.0
            nrm[s, :m] = 1.0 / np.maximum(deg[mine[:, target_col]], 1)
        return sen, rel, rec, msk, nrm

    f = arrays(fwd_parts, deg_in, 2)
    b = arrays(bwd_parts, deg_out, 0)
    return f, b, rows_per


class HaloLayout(NamedTuple):
    """Host-precomputed targeted boundary exchange.

    send_idx: [N_src, N_dst, H] int32 — local row (within src's shard)
              that src ships to dst; pad slots carry 0 (harmless read —
              nothing points at them).
    h:        static per-(owner, consumer) row budget (8-aligned max of
              the actual boundary sizes).

    On device (shard p): ``feats_local[send_idx[p]] -> [N, H, D]``, one
    ``all_to_all`` -> ``[N, H, D]`` where slab q holds the rows p
    requested FROM owner q; flattened to [N*H, D] and indexed by the
    consumer pointers built by :func:`build_halo`.
    """

    send_idx: np.ndarray
    h: int


def build_halo(sources_per_shard, mask_per_shard, rows_per: int,
               n_shards: int, n_vertices: int,
               h_budget: Optional[int] = None):
    """Build a targeted halo layout.

    sources_per_shard: [N, K] int32 global vertex ids each consumer shard
    reads (its edges' source endpoints, or its loss triples' entities);
    entries with mask 0 (padding) are ignored and pointed at slot 0.

    h_budget: static per-(owner, consumer) row budget. When given, the
    layout is padded to exactly this budget so resampled subgraphs share
    ONE compiled executable; a subgraph whose boundary exceeds it raises
    (callers size the budget from probe samples, see
    ``VertexShardedEncoder.probe_budgets``).

    Returns (HaloLayout, ptr [N, K] int32) where ptr indexes the
    flattened [N*H, D] post-exchange buffer.
    """
    sources = np.asarray(sources_per_shard, dtype=np.int64)
    masks = np.asarray(mask_per_shard)
    assert sources.shape[0] == n_shards

    # per (consumer d, REMOTE owner q != d): sorted unique local rows
    # requested. Own-shard reads never ride the exchange: they index the
    # local slab appended after the [N*H] remote buffer, so the uniform
    # budget H reflects only inter-chip boundary sizes.
    rows: list = [[None] * n_shards for _ in range(n_shards)]
    h = 8
    for d in range(n_shards):
        live = sources[d][masks[d] > 0]
        live = live[live < n_vertices]  # drop phantom sentinels
        owners = live // rows_per
        for q in range(n_shards):
            if q == d:
                rows[d][q] = None
                continue
            r = np.unique(live[owners == q] % rows_per).astype(np.int64)
            rows[d][q] = r
            h = max(h, _round_up(len(r), 8))
    if h_budget is not None:
        if h > h_budget:
            raise ValueError(
                f"halo budget {h_budget} rows < required {h}; raise the "
                "budget (probe_budgets slack) or resample the subgraph")
        h = h_budget

    send_idx = np.zeros((n_shards, n_shards, h), np.int32)
    for d in range(n_shards):
        for q in range(n_shards):
            if q == d:
                continue
            r = rows[d][q]
            send_idx[q, d, :len(r)] = r

    ptr = np.zeros(sources.shape, np.int32)
    for d in range(n_shards):
        src = sources[d]
        valid = (masks[d] > 0) & (src < n_vertices)
        owners = np.where(valid, src // rows_per, 0)
        local = np.where(valid, src % rows_per, 0)
        p = np.zeros(src.shape, np.int64)
        for q in range(n_shards):
            sel = valid & (owners == q)
            if not sel.any():
                continue
            if q == d:  # direct local-slab pointer
                p[sel] = n_shards * h + local[sel]
            else:
                slot = np.searchsorted(rows[d][q], local[sel])
                p[sel] = q * h + slot
        ptr[d] = p.astype(np.int32)
    return HaloLayout(send_idx, h), ptr


def halo_traffic_rows(layout: HaloLayout, rows_per: int, n_shards: int):
    """Inter-chip rows shipped per shard per exchange:
    (targeted, all_gather)."""
    return (n_shards - 1) * layout.h, (n_shards - 1) * rows_per


def _halo_exchange(feats_local: jax.Array, send_idx: jax.Array,
                   axis: str) -> jax.Array:
    """[rows_per, D] local rows -> [N*H + rows_per, D]: requested remote
    rows followed by the local slab (own-shard reads bypass the wire)."""
    return jnp.concatenate(
        [_halo_exchange_remote(feats_local, send_idx, axis), feats_local])


def _halo_exchange_remote(feats_local: jax.Array, send_idx: jax.Array,
                          axis: str) -> jax.Array:
    """The wire half of the halo exchange only: [N*H, D] remote rows
    (slab q holds the rows this shard requested from owner q). Used by the
    overlapped path, which consumes the local slab separately so local
    work carries no data dependence on the collective."""
    buf = feats_local[send_idx]                      # [N, H, D]
    buf = jax.lax.all_to_all(buf, axis, 0, 0)        # slab q <- owner q
    return buf.reshape(-1, feats_local.shape[-1])


_SUPPORTED_VARIANTS = ("basis", "block", "diag", "basis_plus_diag",
                       "basis_times_diag")


class VertexShardedEncoder:
    """Vertex-sharded forward pass / training loss for GCN encoders.

    halo: 'targeted' (default — per-pair boundary lists + one all_to_all
    per layer) or 'all_gather' (exchange all rows; the round-1 fallback).
    """

    def __init__(self, model: RGCNModel, mesh: Mesh,
                 halo: str = "targeted", overlap: bool = False,
                 dropout_mode: str = "per_shard",
                 fused_kernel: Optional[bool] = None):
        e = model.config.encoder
        variant = "diag" if e.name == "gcn_diag" else e.gcn_variant
        dense_input = e.name == "gcn_diag" or e.use_input_transform
        if not (model.is_gcn and dense_input
                and variant in _SUPPORTED_VARIANTS
                and e.skip_connections == "None"
                and not model.variational and not model.has_state):
            raise ValueError(
                "VertexShardedEncoder supports the dense-input "
                f"{_SUPPORTED_VARIANTS} variants without skip connections")
        if halo not in ("targeted", "all_gather"):
            raise ValueError(f"unknown halo mode {halo!r}")
        if dropout_mode not in ("per_shard", "full_parity"):
            raise ValueError(f"unknown dropout_mode {dropout_mode!r}")
        if overlap and halo != "targeted":
            raise ValueError("overlap requires halo='targeted'")
        # fused_kernel: run the per-layer aggregation through the fused
        # staircase-v2 kernel (ops/staircase2.py — the production
        # single-chip/mesh fast path) on shard-local layouts whose
        # GATHER side indexes the post-halo feature buffer and whose
        # SCATTER side targets the shard's owned rows. The twin layout
        # (backward dfeats) scatters into the halo-buffer index space,
        # so the cotangents flow back through the all_to_all transpose
        # automatically. Default: on for the block variant (the
        # flagship), off otherwise; the overlapped schedule keeps the
        # split local/remote segment-sum formulation.
        if fused_kernel is None:
            fused_kernel = variant in ("block", "basis") and not overlap
        if fused_kernel and variant not in ("block", "basis"):
            raise ValueError("fused_kernel supports the block and basis "
                             "variants")
        if fused_kernel and overlap:
            raise ValueError("fused_kernel and overlap are mutually "
                             "exclusive (the overlapped schedule splits "
                             "messages by locality)")
        self.fused = bool(fused_kernel)
        # Fused-path message precision follows the encoder config (the
        # single-chip production setting); the segment-sum path computes
        # f32 as before.
        mp = getattr(e, "message_precision", None)
        self._agg_dtype = jnp.bfloat16 if mp in ("bfloat16", "bf16") \
            else None
        self.model = model
        self.mesh = mesh
        self.halo = halo
        # overlap: split each direction's messages into a local-source half
        # (computable from the shard's own rows, no communication) and a
        # remote-source half that consumes the halo exchange. The local
        # half + self-loop matmul carry no data dependence on the
        # all_to_all, so XLA's latency-hiding scheduler can run them while
        # the boundary rows are in flight (BASELINE.json: exchange
        # "overlapped with local aggregation"). Costs a second pass of the
        # per-edge transform, so it pays off when the exchange, not the
        # transform, is the bottleneck. Numerics identical either way
        # (tests/test_vertex_sharded.py).
        self.overlap = overlap
        # dropout_mode: 'per_shard' draws the train-mode self-loop mask
        # over the shard's OWN [rows_per, d] rows (rng folded with the
        # shard index) — the beyond-HBM-scalable default. 'full_parity'
        # draws the single-chip [V, d] mask and slices, reproducing the
        # single-chip RNG stream bit-for-bit (parity tests).
        self.dropout_mode = dropout_mode
        self.variant = variant
        self.n_shards = int(mesh.devices.size)
        self.rows_per = -(-model.n_entities // self.n_shards)
        self.v_pad = self.rows_per * self.n_shards

    # -- host-side layouts -------------------------------------------------
    def prepare(self, triples: np.ndarray, pad_to: int,
                halo_budget: Optional[int] = None):
        """Destination-partitioned edge arrays + per-direction halo
        layouts. Returns (f_arrays, b_arrays) where each is the 5-tuple
        (senders, relations, receivers, mask, norm) stacked [N, E_pad],
        plus per-direction (send_idx [N,N,H], src_ptr [N,E_pad]).

        halo_budget: fixed per-(owner, consumer) halo row count — with a
        fixed pad_to this makes every resampled subgraph's layout
        shape-identical, so the jitted step compiles ONCE."""
        f, b, _ = partition_edges_by_destination(
            triples, self.model.n_entities, self.n_shards, pad_to,
            self.model.n_relations)
        f_sen, f_rel, f_rec, f_msk, f_nrm = f
        b_sen, b_rel, b_rec, b_msk, b_nrm = b
        # forward messages read SENDER features; backward read RECEIVERS.
        f_halo, f_ptr = build_halo(f_sen, f_msk, self.rows_per,
                                   self.n_shards, self.model.n_entities,
                                   h_budget=halo_budget)
        b_halo, b_ptr = build_halo(b_rec, b_msk, self.rows_per,
                                   self.n_shards, self.model.n_entities,
                                   h_budget=halo_budget)
        self._traffic = (halo_traffic_rows(f_halo, self.rows_per,
                                           self.n_shards),
                         halo_traffic_rows(b_halo, self.rows_per,
                                           self.n_shards))
        f_out = (f_sen, f_rel, f_rec, f_msk, f_nrm, f_halo.send_idx, f_ptr)
        b_out = (b_sen, b_rel, b_rec, b_msk, b_nrm, b_halo.send_idx, b_ptr)
        if self.fused:
            f_pair = self._sc2_dir_layouts(
                f_out, gather_col="sender", h=f_halo.h)
            b_pair = self._sc2_dir_layouts(
                b_out, gather_col="receiver", h=b_halo.h)
            f_out = f_out + (f_pair,)
            b_out = b_out + (b_pair,)
        return f_out, b_out

    def _sc2_dir_layouts(self, arrays, gather_col: str, h: int):
        """Per-shard fused staircase-v2 layouts for one direction,
        concatenated for shard_map consumption.

        The gather side indexes this direction's post-halo feature
        buffer (length H = n_shards*h + rows_per for 'targeted'; v_pad
        for 'all_gather'); the scatter side targets the shard's OWNED
        rows [0, rows_per). The twin layout swaps the two spaces so the
        backward's dfeats kernel scatters into the halo buffer, whence
        autodiff of the exchange routes cotangents home. Pad bounds are
        pure functions of the static budgets (sample-independent), so
        resampled subgraphs share one executable.
        """
        from ..ops import staircase2 as s2
        sen, rel, rec, msk, nrm, _, ptr = arrays
        rb, chunk = 256, 512
        n = self.n_shards
        e_pad = sen.shape[1]
        dest_glob = rec if gather_col == "sender" else sen
        if self.halo == "targeted":
            src_idx = ptr
            h_len = n * h + self.rows_per
        else:
            raw = sen if gather_col == "sender" else rec
            src_idx = np.minimum(raw, self.v_pad - 1)
            h_len = self.v_pad

        def plan(n_vertices):
            n_blocks = -(-n_vertices // rb)
            k = int(np.clip(-(-e_pad // (chunk * n_blocks)), 1, 16))
            bound = n_blocks + -(-e_pad // (k * chunk))
            return k, bound

        k_f, bound_f = plan(self.rows_per)
        k_t, bound_t = plan(h_len)
        fwds, twins = [], []
        for s_ in range(n):
            row0 = s_ * self.rows_per
            dest = np.clip(dest_glob[s_].astype(np.int64) - row0, 0,
                           self.rows_per - 1).astype(np.int32)
            w = (nrm[s_] * msk[s_]).astype(np.float32)
            fwds.append(s2.build_staircase2_layout(
                src_idx[s_].astype(np.int32), rel[s_], dest, w,
                self.rows_per, rb=rb, chunk=chunk, k=k_f, group=1,
                pad_rows_to=bound_f, to_device=False))
            twins.append(s2.build_staircase2_layout(
                dest, rel[s_], src_idx[s_].astype(np.int32), w,
                h_len, rb=rb, chunk=chunk, k=k_t, group=1,
                pad_rows_to=bound_t, to_device=False))
        fwd = s2._concat_layouts(fwds)
        twin = s2._concat_layouts(twins)
        dev = jnp.asarray
        fwd = fwd._replace(**{f: dev(getattr(fwd, f))
                              for f in s2._S2_ARRAYS})
        twin = twin._replace(**{f: dev(getattr(twin, f))
                                for f in s2._S2_ARRAYS})
        return s2.Staircase2Pair(fwd=fwd, twin=twin)

    def probe_budgets(self, sample_fn, n_probes: int = 8,
                      slack: float = 1.5):
        """Size the static layout budgets from probe subgraph samples.

        sample_fn() -> (graph_triples [E, 3], loss_triples [T, 3]): one
        host-sampled training subgraph + its (negative-sampled) loss
        batch. Returns dict(edge_pad, halo_budget, dec_halo_budget, t_pad)
        such that typical resampled batches fit; a pathological batch
        that overflows raises at prepare() time with a clear message
        rather than silently recompiling.
        """
        max_edges = 8
        max_h = 8
        max_dec_h = 8
        max_t = 8
        for _ in range(n_probes):
            triples, loss_x = sample_fn()
            triples = np.asarray(triples, dtype=np.int64)
            factored = isinstance(loss_x, tuple)
            if factored:
                # loss_x = (positives [n,3], corruption values [n,k]):
                # the factored layout slices POSITIVES and halos
                # e1/e2 + the k corrupted ids per positive
                # (prepare_batch_factored).
                pos, vals = (np.asarray(a, dtype=np.int64)
                             for a in loss_x)
                loss_x = pos
            else:
                loss_x = np.asarray(loss_x, dtype=np.int64)
            max_t = max(max_t, len(loss_x))
            for col in (2, 0):  # forward dst / backward dst
                per = np.bincount(triples[:, col] // self.rows_per,
                                  minlength=self.n_shards)
                max_edges = max(max_edges, int(per.max()))
            # halo row requirement: for each (consumer, owner) pair the
            # unique boundary rows; probe both directions.
            for src_col, dst_col in ((0, 2), (2, 0)):
                dst_shard = triples[:, dst_col] // self.rows_per
                src = triples[:, src_col]
                for d in range(self.n_shards):
                    mine = src[dst_shard == d]
                    owners = mine // self.rows_per
                    for q in range(self.n_shards):
                        if q == d:
                            continue
                        h = len(np.unique(mine[owners == q]))
                        max_h = max(max_h, h)
            # decoder halo: measured exactly the way prepare_batch /
            # prepare_batch_factored lays the loss batch out (row-major
            # split into n_shards slices).
            t_loc = _round_up(len(loss_x), self.n_shards * 8) \
                // self.n_shards
            for d in range(self.n_shards):
                sl = loss_x[d * t_loc:(d + 1) * t_loc]
                ents = [sl[:, 0], sl[:, 2]]
                if factored:
                    ents.append(vals[d * t_loc:(d + 1) * t_loc]
                                .reshape(-1))
                ents = np.concatenate(ents)
                owners = ents // self.rows_per
                for q in range(self.n_shards):
                    if q == d:
                        continue
                    max_dec_h = max(max_dec_h,
                                    len(np.unique(ents[owners == q])))
        cap = _round_up(self.rows_per, 8)
        return {
            "edge_pad": _round_up(int(max_edges * slack), 8),
            "halo_budget": min(_round_up(int(max_h * slack), 8), cap),
            "dec_halo_budget": min(_round_up(int(max_dec_h * slack), 8),
                                   cap),
            "t_pad": _round_up(int(max_t), self.n_shards * 8),
        }

    def pad_params(self, params):
        """Pad the input-transform table to v_pad rows for even sharding."""
        w = np.asarray(params["input_transform"]["W"])
        pad = self.v_pad - w.shape[0]
        if pad:
            w = np.concatenate([w, np.zeros((pad, w.shape[1]), w.dtype)])
        out = jax.tree_util.tree_map(np.asarray, params)
        out["input_transform"] = dict(out["input_transform"])
        out["input_transform"]["W"] = w
        return out

    def place_state(self, tree):
        """Device-place a params/optimizer-state pytree with its
        steady-state shardings (entity-table-shaped leaves row-sharded,
        everything else replicated). Placing BEFORE the first step makes
        every call to the jitted step sharding-identical, so resampled
        subgraphs reuse one executable from step 0."""
        from jax.sharding import NamedSharding
        row = NamedSharding(self.mesh, P(EDGE_AXIS))
        rep = NamedSharding(self.mesh, P())

        def put(x):
            sharded = getattr(x, "ndim", 0) >= 1 and x.shape[0] == self.v_pad
            return jax.device_put(np.asarray(x), row if sharded else rep)

        return jax.tree_util.tree_map(put, tree)

    def unpad_params(self, params):
        """Inverse of pad_params: trim the input-transform table back to
        [V, d] (for checkpoint interchange with single-chip runs)."""
        out = jax.tree_util.tree_map(np.asarray, params)
        out["input_transform"] = dict(out["input_transform"])
        out["input_transform"]["W"] = \
            out["input_transform"]["W"][:self.model.n_entities]
        return out

    def param_spec(self, params):
        """PartitionSpec tree: input-transform rows sharded, rest
        replicated."""
        flat = jax.tree_util.tree_map(lambda _: P(), params)
        it = dict(flat["input_transform"])
        it["W"] = P(EDGE_AXIS)
        flat = dict(flat)
        flat["input_transform"] = it
        return flat

    # -- device-side encode -------------------------------------------------
    def _local_encode(self, params, f_arrays, b_arrays, rng,
                      deterministic: bool):
        """Per-shard encode body (runs inside shard_map). Returns the
        shard's [rows_per, d] final entity codes."""
        e = self.model.config.encoder
        rows_per = self.rows_per
        n_vertices = self.model.n_entities
        shard = jax.lax.axis_index(EDGE_AXIS)
        row0 = shard * rows_per
        # shard_map leaves a leading size-1 shard axis on stacked inputs;
        # the optional 8th element (fused staircase layouts) is CONCAT
        # along its own leading axis, so the shard slice needs no strip.
        f_pair = f_arrays[7] if len(f_arrays) > 7 else None
        b_pair = b_arrays[7] if len(b_arrays) > 7 else None
        f_sen, f_rel, f_rec, f_msk, f_nrm, f_send, f_ptr = (
            a[0] for a in f_arrays[:7])
        b_sen, b_rel, b_rec, b_msk, b_nrm, b_send, b_ptr = (
            a[0] for a in b_arrays[:7])

        w = params["input_transform"]["W"]           # [rows_per, d] local
        bias = params["input_transform"]["b"]
        # apply_affine(onehot, use_bias, use_nonlinearity) == relu(W + b)
        feats_local = jax.nn.relu(w + bias)

        for li, lp in enumerate(params["gcn_layers"]):
            use_nonlinearity = li < e.n_layers - 1
            lrng = (jax.random.fold_in(rng, 100 + li)
                    if rng is not None else None)

            if self.halo == "targeted" and self.overlap:
                # Overlapped schedule: issue both direction exchanges,
                # then compute everything that only needs the shard's own
                # rows (local-source messages; the self-loop matmul below
                # is likewise independent) while the boundary rows fly.
                nh_f = self.n_shards * f_send.shape[-1]
                nh_b = self.n_shards * b_send.shape[-1]
                f_remote = _halo_exchange_remote(feats_local, f_send,
                                                 EDGE_AXIS)
                b_remote = _halo_exchange_remote(feats_local, b_send,
                                                 EDGE_AXIS)
                f_loc = (f_ptr >= nh_f)
                b_loc = (b_ptr >= nh_b)
                fwd = enc._edge_messages(
                    lp, self.variant, feats_local,
                    jnp.where(f_loc, f_ptr - nh_f, 0), f_rel, "forward",
                    e.n_bases) * f_loc[:, None]
                bwd = enc._edge_messages(
                    lp, self.variant, feats_local,
                    jnp.where(b_loc, b_ptr - nh_b, 0), b_rel, "backward",
                    e.n_bases) * b_loc[:, None]
                fwd = fwd + enc._edge_messages(
                    lp, self.variant, f_remote,
                    jnp.where(f_loc, 0, f_ptr), f_rel, "forward",
                    e.n_bases) * (~f_loc)[:, None]
                bwd = bwd + enc._edge_messages(
                    lp, self.variant, b_remote,
                    jnp.where(b_loc, 0, b_ptr), b_rel, "backward",
                    e.n_bases) * (~b_loc)[:, None]
            elif self.fused:
                # Fused staircase-v2 kernel on shard-local layouts: one
                # kernel pass per direction does gather -> relational
                # block transform -> one-hot MXU scatter into the owned
                # rows (normalization weights live in the layout). The
                # gather side indexes the post-halo buffer; its backward
                # (twin layout) scatters cotangents into that buffer,
                # whence the exchange's autodiff routes them home.
                from ..ops import staircase2 as s2
                if self.halo == "targeted":
                    f_tab = _halo_exchange(feats_local, f_send, EDGE_AXIS)
                    b_tab = _halo_exchange(feats_local, b_send, EDGE_AXIS)
                else:
                    full = jax.lax.all_gather(feats_local, EDGE_AXIS,
                                              tiled=True)
                    f_tab = b_tab = full
                interp = s2.default_interpret()
                if self.variant == "block":
                    coll_f = s2.block_direction(
                        f_tab, lp["W_forward"], f_pair, e.n_bases,
                        rows_per, interp, self._agg_dtype)
                    coll_b = s2.block_direction(
                        b_tab, lp["W_backward"], b_pair, e.n_bases,
                        rows_per, interp, self._agg_dtype)
                else:  # basis
                    wf = lp["W_forward"].reshape(
                        lp["W_forward"].shape[0], -1)
                    wb = lp["W_backward"].reshape(
                        lp["W_backward"].shape[0], -1)
                    coll_f = s2.basis_direction(
                        f_tab, wf, lp["C_forward"], f_pair, e.n_bases,
                        rows_per, interp, self._agg_dtype)
                    coll_b = s2.basis_direction(
                        b_tab, wb, lp["C_backward"], b_pair, e.n_bases,
                        rows_per, interp, self._agg_dtype)
            elif self.halo == "targeted":
                f_feats = _halo_exchange(feats_local, f_send, EDGE_AXIS)
                b_feats = _halo_exchange(feats_local, b_send, EDGE_AXIS)
                fwd = enc._edge_messages(lp, self.variant, f_feats, f_ptr,
                                         f_rel, "forward", e.n_bases)
                bwd = enc._edge_messages(lp, self.variant, b_feats, b_ptr,
                                         b_rel, "backward", e.n_bases)
            else:
                full = jax.lax.all_gather(feats_local, EDGE_AXIS,
                                          tiled=True)  # [v_pad, d]
                fwd = enc._edge_messages(lp, self.variant, full, f_sen,
                                         f_rel, "forward", e.n_bases)
                bwd = enc._edge_messages(lp, self.variant, full, b_rec,
                                         b_rel, "backward", e.n_bases)

            if not self.fused:
                # Local segment-sum aggregation into owned rows only.
                f_local = jnp.clip(f_rec - row0, 0, rows_per)
                f_local = jnp.where(f_msk > 0, f_local, rows_per)
                coll_f = jax.ops.segment_sum(
                    fwd * f_nrm[:, None], f_local,
                    num_segments=rows_per + 1,
                    indices_are_sorted=True)[:rows_per]
                b_local = jnp.clip(b_sen - row0, 0, rows_per)
                b_local = jnp.where(b_msk > 0, b_local, rows_per)
                coll_b = jax.ops.segment_sum(
                    bwd * b_nrm[:, None], b_local,
                    num_segments=rows_per + 1,
                    indices_are_sorted=True)[:rows_per]

            self_loop = jnp.dot(feats_local, lp["W_self"],
                                preferred_element_type=jnp.float32)
            if not deterministic:
                if self.dropout_mode == "per_shard":
                    # O(rows_per * d) per chip: each shard draws its own
                    # stream (rng folded with the shard index). Same
                    # distribution as single-chip, different stream.
                    keep = jax.random.bernoulli(
                        jax.random.fold_in(lrng, shard),
                        e.dropout_keep_probability,
                        (rows_per, self_loop.shape[-1]))
                else:
                    # full_parity: the single-chip [V, d] mask, row-sliced
                    # — bit-identical losses for the parity tests, but
                    # O(V * d) per chip.
                    keep = jax.random.bernoulli(
                        lrng, e.dropout_keep_probability,
                        (n_vertices, self_loop.shape[-1]))
                    keep = jnp.concatenate(
                        [keep, jnp.ones((self.v_pad - n_vertices,
                                         keep.shape[-1]), bool)])
                    keep = jax.lax.dynamic_slice_in_dim(keep, row0,
                                                        rows_per)
                self_loop = jnp.where(
                    keep, self_loop / e.dropout_keep_probability, 0.0)
            out = coll_f + coll_b + self_loop
            if self.variant in ("diag", "basis_plus_diag",
                                "basis_times_diag"):
                out = out + lp["b"]   # bias quirk: basis/block never add it
            if use_nonlinearity:
                out = jax.nn.relu(out)
            feats_local = out

        if e.use_output_transform:
            ot = params["output_transform"]
            feats_local = jnp.dot(feats_local, ot["W"],
                                  preferred_element_type=jnp.float32) \
                + ot["b"]
        return feats_local

    def _array_specs(self, arrays):
        """shard_map in_specs for a prepare() arrays tuple: the 7 stacked
        edge arrays shard on their leading axis; the optional fused
        staircase pair shards every layout array's (concat) leading
        axis."""
        specs = [P(EDGE_AXIS)] * 7
        if len(arrays) > 7:
            specs.append(jax.tree_util.tree_map(lambda _: P(EDGE_AXIS),
                                                arrays[7]))
        return tuple(specs)

    def encode_fn(self) -> Callable:
        """jitted shard_map'd encode: returns vertex-sharded [v_pad, d]
        codes (row-sharded over the mesh)."""

        def wrapped(params, f_arrays, b_arrays):
            def body(p, f, b):
                return self._local_encode(p, f, b, rng=None,
                                          deterministic=True)
            return shard_map(
                body, mesh=self.mesh,
                in_specs=(self.param_spec(params),
                          self._array_specs(f_arrays),
                          self._array_specs(b_arrays)),
                out_specs=P(EDGE_AXIS), check_vma=False)(
                    params, f_arrays, b_arrays)

        return jax.jit(wrapped)

    # -- training loss --------------------------------------------------
    def prepare_batch(self, x: np.ndarray, y: np.ndarray,
                      t_pad: Optional[int] = None,
                      halo_budget: Optional[int] = None):
        """Stack a host-sampled loss batch (e.g. NegativeSampler output)
        into per-shard slices + the decoder halo for its entities.

        t_pad / halo_budget: static shapes for one-compile training
        across resampled batches (see :meth:`probe_budgets`).

        Returns (triples [N,T,3], labels [N,T], mask [N,T],
                 dec_send [N,N,H], e1_ptr [N,T], e2_ptr [N,T])."""
        n = self.n_shards
        if t_pad is None:
            t_pad = _round_up(len(x), n * 8)
        elif len(x) > t_pad:
            raise ValueError(f"batch of {len(x)} loss triples > static "
                             f"t_pad {t_pad}")
        xt = np.zeros((t_pad, 3), np.int32)
        yt = np.zeros((t_pad,), np.float32)
        mt = np.zeros((t_pad,), np.float32)
        xt[:len(x)] = x
        yt[:len(y)] = y
        mt[:len(x)] = 1.0
        t_loc = t_pad // n
        xt = xt.reshape(n, t_loc, 3)
        yt = yt.reshape(n, t_loc)
        mt = mt.reshape(n, t_loc)
        ents = np.concatenate([xt[:, :, 0], xt[:, :, 2]], axis=1)
        emask = np.concatenate([mt, mt], axis=1)
        halo, ptr = build_halo(ents, emask, self.rows_per, self.n_shards,
                               self.model.n_entities,
                               h_budget=halo_budget)
        e1_ptr, e2_ptr = ptr[:, :t_loc], ptr[:, t_loc:]
        return xt, yt, mt, halo.send_idx, e1_ptr, e2_ptr

    def prepare_batch_factored(self, x: np.ndarray, values: np.ndarray,
                               corrupt_object: np.ndarray,
                               t_pad: Optional[int] = None,
                               halo_budget: Optional[int] = None):
        """Lay out a factored-binomial loss batch: per-shard POSITIVE
        slices plus host-drawn corruption parts, with the corrupted
        entity ids riding the decoder halo (the 'corruption-in-halo'
        design: corruptions are host-drawn — exactly the reference's
        protocol, ``auxilliaries.py:13-33`` — so their boundary rows are
        known when the halo is built; no device-drawn ids needed).

        x: [n, 3] positives; values: [n, k] corrupted entity ids;
        corrupt_object: [n, k] bool. Returns (triples [N,T,3],
        mask [N,T], values [N,T,k], corrupt [N,T,k], dec_send,
        e1_ptr [N,T], e2_ptr [N,T], ev_ptr [N,T,k])."""
        n = self.n_shards
        k = values.shape[1]
        if t_pad is None:
            t_pad = _round_up(len(x), n * 8)
        elif len(x) > t_pad:
            raise ValueError(f"batch of {len(x)} positives > static "
                             f"t_pad {t_pad}")
        xt = np.zeros((t_pad, 3), np.int32)
        mt = np.zeros((t_pad,), np.float32)
        vt = np.zeros((t_pad, k), np.int32)
        ct = np.zeros((t_pad, k), bool)
        xt[:len(x)] = x
        mt[:len(x)] = 1.0
        vt[:len(x)] = values
        ct[:len(x)] = corrupt_object
        t_loc = t_pad // n
        xt = xt.reshape(n, t_loc, 3)
        mt = mt.reshape(n, t_loc)
        vt = vt.reshape(n, t_loc, k)
        ct = ct.reshape(n, t_loc, k)
        ents = np.concatenate(
            [xt[:, :, 0], xt[:, :, 2], vt.reshape(n, t_loc * k)], axis=1)
        emask = np.concatenate(
            [mt, mt, np.repeat(mt, k, axis=1)], axis=1)
        halo, ptr = build_halo(ents, emask, self.rows_per, self.n_shards,
                               self.model.n_entities,
                               h_budget=halo_budget)
        e1_ptr = ptr[:, :t_loc]
        e2_ptr = ptr[:, t_loc:2 * t_loc]
        ev_ptr = ptr[:, 2 * t_loc:].reshape(n, t_loc, k)
        return (xt, mt, vt, ct, halo.send_idx, e1_ptr, e2_ptr, ev_ptr)

    def loss_fn(self) -> Callable:
        """Scalar training loss (replicated) over a vertex-sharded forward
        pass; differentiable w.r.t. the sharded params. Host-sampled
        negatives (the reference's protocol) — device-side corruption
        would need per-step dynamic halo lists."""
        model = self.model

        def local_loss(params, f_arrays, b_arrays, triples, labels, mask,
                       dec_send, e1_ptr, e2_ptr, rng):
            codes_local = self._local_encode(params, f_arrays, b_arrays,
                                             rng, deterministic=False)
            triples, labels, mask = triples[0], labels[0], mask[0]
            dec_send, e1_ptr, e2_ptr = dec_send[0], e1_ptr[0], e2_ptr[0]
            halo = _halo_exchange(codes_local, dec_send, EDGE_AXIS)
            e1 = halo[e1_ptr]
            e2 = halo[e2_ptr]
            r = params["relation_embedding"]["W_relation"][triples[:, 1]]
            energies = model.decoder.energies(params["decoder"], e1, r, e2)
            loss = decoders_lib.weighted_ce_loss(energies, labels, mask,
                                                 axis_name=EDGE_AXIS)
            loss = loss + model.decoder.regularization(
                params["decoder"], e1, r, e2, mask, axis_name=EDGE_AXIS)
            return loss

        def wrapped(params, f_arrays, b_arrays, triples, labels, mask,
                    dec_send, e1_ptr, e2_ptr, rng):
            return shard_map(
                local_loss, mesh=self.mesh,
                in_specs=(self.param_spec(params),
                          self._array_specs(f_arrays),
                          self._array_specs(b_arrays),
                          P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS),
                          P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS), P()),
                out_specs=P(), check_vma=False)(
                    params, f_arrays, b_arrays, triples, labels, mask,
                    dec_send, e1_ptr, e2_ptr, rng)

        return wrapped

    def loss_fn_factored(self) -> Callable:
        """Factored-binomial training loss over the vertex-sharded
        forward pass — the reference's exact corruption protocol with
        host-drawn parts and the corrupted codes gathered through the
        decoder halo (prepare_batch_factored). Removes the
        ``not vertex_sharded`` exclusion from round 4: the beyond-HBM
        path now pays ~15n gathered rows instead of the tiled ~33n."""
        import jax.numpy as jnp  # noqa: F811 - local alias for clarity

        from ..models.build import binomial_factored_objective
        model = self.model

        def local_loss(params, f_arrays, b_arrays, triples, mask, values,
                       corrupt, dec_send, e1_ptr, e2_ptr, ev_ptr, rng):
            codes_local = self._local_encode(params, f_arrays, b_arrays,
                                             rng, deterministic=False)
            triples, mask = triples[0], mask[0]
            values, corrupt = values[0], corrupt[0]
            dec_send, e1_ptr, e2_ptr, ev_ptr = (
                dec_send[0], e1_ptr[0], e2_ptr[0], ev_ptr[0])
            halo = _halo_exchange(codes_local, dec_send, EDGE_AXIS)
            dp = params["decoder"]
            e1 = halo[e1_ptr]
            e2 = halo[e2_ptr]
            r = params["relation_embedding"]["W_relation"][triples[:, 1]]
            pos_energy = model.decoder.energies(dp, e1, r, e2)
            q_subj = model.decoder.subject_factor(dp, r, e2)
            q_obj = model.decoder.object_factor(dp, e1, r)
            ev = halo[ev_ptr]                                # [T, k, d]
            co_f = corrupt.astype(jnp.float32)
            es = jnp.sum(ev * q_subj[:, None, :], axis=-1,
                         dtype=jnp.float32)
            eo = jnp.sum(ev * q_obj[:, None, :], axis=-1,
                         dtype=jnp.float32)
            neg_energy = es + co_f * (eo - es)
            ev_sq = jnp.sum(ev.astype(jnp.float32) ** 2, axis=-1)
            return binomial_factored_objective(
                model.decoder, pos_energy, neg_energy, ev_sq, e1, r, e2,
                mask, corrupt, axis_name=EDGE_AXIS)

        def wrapped(params, f_arrays, b_arrays, triples, mask, values,
                    corrupt, dec_send, e1_ptr, e2_ptr, ev_ptr, rng):
            return shard_map(
                local_loss, mesh=self.mesh,
                in_specs=(self.param_spec(params),
                          self._array_specs(f_arrays),
                          self._array_specs(b_arrays),
                          P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS),
                          P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS),
                          P(EDGE_AXIS), P(EDGE_AXIS), P()),
                out_specs=P(), check_vma=False)(
                    params, f_arrays, b_arrays, triples, mask, values,
                    corrupt, dec_send, e1_ptr, e2_ptr, ev_ptr, rng)

        return wrapped

    def make_train_step(self, optimizer, factored: bool = False
                        ) -> Callable:
        """jitted (params, opt_state, graph arrays, batch, rng) ->
        (params, opt_state, loss) with the entity table sharded."""
        if factored:
            loss_fn_f = self.loss_fn_factored()

            @jax.jit
            def step_f(params, opt_state, f_arrays, b_arrays, triples,
                       mask, values, corrupt, dec_send, e1_ptr, e2_ptr,
                       ev_ptr, rng):
                loss, grads = jax.value_and_grad(loss_fn_f)(
                    params, f_arrays, b_arrays, triples, mask, values,
                    corrupt, dec_send, e1_ptr, e2_ptr, ev_ptr, rng)
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                params = jax.tree_util.tree_map(lambda a, u: a + u,
                                                params, updates)
                return params, opt_state, loss

            return step_f

        loss_fn = self.loss_fn()

        @jax.jit
        def step(params, opt_state, f_arrays, b_arrays, triples, labels,
                 mask, dec_send, e1_ptr, e2_ptr, rng):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, f_arrays, b_arrays, triples, labels, mask,
                dec_send, e1_ptr, e2_ptr, rng)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda a, u: a + u, params,
                                            updates)
            return params, opt_state, loss

        return step


class VSBatch(NamedTuple):
    """One vertex-sharded training batch (pytree of host arrays), laid
    out to the pipeline's static budgets — every batch is shape-identical
    so the jitted step compiles once across resampled subgraphs."""

    f_arrays: tuple
    b_arrays: tuple
    triples: np.ndarray
    labels: np.ndarray          # None in factored-binomial mode
    mask: np.ndarray
    dec_send: np.ndarray
    e1_ptr: np.ndarray
    e2_ptr: np.ndarray
    # factored-binomial mode only (host-drawn corruption parts + the
    # corrupted ids' halo pointers); None in tiled mode:
    neg_values: Optional[np.ndarray] = None
    corrupt_object: Optional[np.ndarray] = None
    ev_ptr: Optional[np.ndarray] = None


class VertexShardedBatchPipeline:
    """Host-side batch construction for vertex-sharded training.

    The BatchPipeline analogue for the row-sharded entity table: samples
    the training subgraph + negative-sampled loss batch exactly like the
    single-chip pipeline (same sampler semantics, ``train.py:205-247``),
    then lays both out into destination-partitioned per-shard arrays with
    STATIC budgets probed at construction (probe_budgets), so steps over
    resampled subgraphs never recompile.
    """

    def __init__(self, vse: "VertexShardedEncoder", config,
                 dataset, rng: np.random.Generator,
                 sampler: str = "neighborhood",
                 n_probes: int = 8, slack: float = 1.5,
                 budgets: Optional[dict] = None,
                 factored: bool = False):
        from ..sampling import (AdjacencyIndex, NegativeSampler,
                                graph_split, sample_edge_neighborhood_fast,
                                sample_uniform_edges)
        self.vse = vse
        self.config = config
        self.train = np.asarray(dataset.train, dtype=np.int32)
        self.rng = rng
        self.sampler = sampler
        t = config.training
        n_train = len(self.train)
        gbs = t.graph_batch_size or n_train
        self.graph_batch_size = min(gbs, n_train)
        self.split_size = int(t.graph_split_size * self.graph_batch_size)
        self.adj = AdjacencyIndex(self.train, config.entity_count)
        self.ns = NegativeSampler(t.negative_sample_rate,
                                  config.entity_count, rng)
        self._graph_split = graph_split
        self._sample_nbh = sample_edge_neighborhood_fast
        self._sample_uni = sample_uniform_edges
        # factored: draw the reference's binomial corruption PARTS on the
        # host (uniform entity + coin flip per slot — the same protocol
        # auxilliaries.py:13-33 draws) and ship the corrupted ids through
        # the decoder halo instead of materializing the tiled batch.
        self.factored = factored

        if budgets is None:
            # Budget probe runs on an independent RNG so the production
            # batch stream (a pure function of `rng`) is untouched.
            probe_rng = np.random.default_rng(0xB0D6E7)
            probe_ns = NegativeSampler(t.negative_sample_rate,
                                       config.entity_count, probe_rng)

            def sample_fn():
                ids = self._sample_ids(probe_rng)
                split = graph_split(ids, t.graph_split_size, probe_rng)
                if factored:
                    pos = self.train[ids]
                    vals = probe_rng.integers(
                        0, config.entity_count,
                        (len(pos), t.negative_sample_rate))
                    return self.train[split], (pos, vals)
                x, _ = probe_ns.transform(self.train[ids])
                return self.train[split], x

            budgets = vse.probe_budgets(sample_fn, n_probes=n_probes,
                                        slack=slack)
        self.budgets = budgets

    def _sample_ids(self, rng):
        if self.graph_batch_size >= len(self.train):
            return np.arange(len(self.train), dtype=np.int32)
        if self.sampler == "neighborhood":
            return self._sample_nbh(self.adj, self.graph_batch_size, rng)
        return self._sample_uni(len(self.train), self.graph_batch_size,
                                rng)

    def next(self) -> VSBatch:
        t = self.config.training
        ids = self._sample_ids(self.rng)
        split = self._graph_split(ids, t.graph_split_size, self.rng)
        b = self.budgets
        f_arrays, b_arrays = self.vse.prepare(
            self.train[split], pad_to=b["edge_pad"],
            halo_budget=b["halo_budget"])
        if self.factored:
            pos = self.train[ids]
            k = t.negative_sample_rate
            vals = self.rng.integers(0, self.config.entity_count,
                                     (len(pos), k)).astype(np.int32)
            co = self.rng.random((len(pos), k)) < 0.5
            (xt, mt, vt, ct, dec_send, e1_ptr, e2_ptr,
             ev_ptr) = self.vse.prepare_batch_factored(
                pos, vals, co, t_pad=b["t_pad"],
                halo_budget=b["dec_halo_budget"])
            return VSBatch(f_arrays, b_arrays, xt, None, mt, dec_send,
                           e1_ptr, e2_ptr, neg_values=vt,
                           corrupt_object=ct, ev_ptr=ev_ptr)
        x, y = self.ns.transform(self.train[ids])
        xt, yt, mt, dec_send, e1_ptr, e2_ptr = self.vse.prepare_batch(
            x, y, t_pad=b["t_pad"], halo_budget=b["dec_halo_budget"])
        return VSBatch(f_arrays, b_arrays, xt, yt, mt, dec_send, e1_ptr,
                       e2_ptr)

    # resumable host state (same contract as BatchPipeline)
    def state(self) -> dict:
        return {"rng": self.rng.bit_generator.state, "cursor": 0}

    def set_state(self, st: dict) -> None:
        self.rng.bit_generator.state = st["rng"]


class VertexShardedModelView:
    """Scorer-compatible evaluation view over a vertex-sharded encode.

    Entity codes stay row-sharded end to end: the encode keeps the
    [v_pad, d] table distributed over the mesh, and all-entity scoring is
    expressed over the SHARDED codes with replicated triple chunks —
    out_shardings pin the score matrix's entity axis to the mesh, so XLA
    runs each chip's decoder GEMM against its own code rows and the full
    table is never replicated (the pjit formulation of the reference's
    all-entity scoring, ``model.py:46-81``).

    Presents the JittedModelView surface (score / score_all_subjects /
    score_all_objects / invalidate); the ``graph`` argument is ignored —
    codes come from the full-train-graph arrays fixed at construction.
    """

    def __init__(self, vse: "VertexShardedEncoder", f_arrays, b_arrays,
                 chunk_pad: int = 1024):
        from jax.sharding import NamedSharding
        self.vse = vse
        self.f_arrays = f_arrays
        self.b_arrays = b_arrays
        self.chunk_pad = chunk_pad
        self._encode = vse.encode_fn()
        mesh = vse.mesh
        self._rep = NamedSharding(mesh, P())
        self._row = NamedSharding(mesh, P(EDGE_AXIS))
        self._col = NamedSharding(mesh, P(None, EDGE_AXIS))
        dec = vse.model.decoder
        n_ent = vse.model.n_entities

        def subj(dec_params, rel_w, codes, t, sig):
            r = rel_w[t[:, 1]]
            e2 = codes[t[:, 2]]
            en = dec.all_subject_energies(dec_params, codes, r, e2)
            return jax.nn.sigmoid(en) if sig else en

        def obj(dec_params, rel_w, codes, t, sig):
            e1 = codes[t[:, 0]]
            r = rel_w[t[:, 1]]
            en = dec.all_object_energies(dec_params, codes, e1, r)
            return jax.nn.sigmoid(en) if sig else en

        def score(dec_params, rel_w, codes, t):
            e1 = codes[t[:, 0]]
            r = rel_w[t[:, 1]]
            e2 = codes[t[:, 2]]
            return jax.nn.sigmoid(dec.energies(dec_params, e1, r, e2))

        jit = functools.partial(
            jax.jit, static_argnums=4,
            in_shardings=(self._rep, self._rep, self._row, self._rep),
            out_shardings=self._col)
        self._subj = jit(subj)
        self._obj = jit(obj)
        self._score = jax.jit(
            score,
            in_shardings=(self._rep, self._rep, self._row, self._rep),
            out_shardings=self._rep)
        self._n_entities = n_ent
        self._key = None
        self._codes = None

    def invalidate(self) -> None:
        """Drop the cached encoded codes.

        Cache contract: ``_encoded`` keys on the params OBJECT (``is``
        identity, a strong reference). Handing in a new params pytree
        re-encodes automatically; mutating the SAME pytree's leaves in
        place between calls would serve stale codes — call invalidate()
        after any in-place update (the training engine always produces
        fresh pytrees, so this only matters for hand-driven use)."""
        self._key = None
        self._codes = None

    def _encoded(self, params):
        if self._key is None or self._key is not params:
            padded = self.vse.pad_params(params) \
                if np.asarray(params["input_transform"]["W"]).shape[0] \
                != self.vse.v_pad else params
            self._padded = padded
            self._codes = self._encode(padded, self.f_arrays,
                                       self.b_arrays)
            self._key = params
        return self._padded, self._codes

    def _chunk(self, triples):
        t = np.asarray(triples, dtype=np.int32).reshape(-1, 3)
        n = t.shape[0]
        if n == 0:
            # np.repeat of an empty t[-1:] would crash; pad with zeros and
            # let callers slice back to [:0].
            return np.zeros((self.chunk_pad, 3), dtype=np.int32), 0
        # Chunks at or under chunk_pad share one compiled executable.
        pad = self.chunk_pad if n <= self.chunk_pad else _round_up(n, 8)
        if n < pad:
            t = np.concatenate([t, np.repeat(t[-1:], pad - n, axis=0)])
        return t, n

    def score_all_subjects(self, params, graph, triples,
                           apply_sigmoid: bool = True):
        padded, codes = self._encoded(params)
        t, n = self._chunk(triples)
        out = self._subj(padded["decoder"],
                         padded["relation_embedding"]["W_relation"],
                         codes, t, apply_sigmoid)
        return np.asarray(out)[:n, :self._n_entities]

    def score_all_objects(self, params, graph, triples,
                          apply_sigmoid: bool = True):
        padded, codes = self._encoded(params)
        t, n = self._chunk(triples)
        out = self._obj(padded["decoder"],
                        padded["relation_embedding"]["W_relation"],
                        codes, t, apply_sigmoid)
        return np.asarray(out)[:n, :self._n_entities]

    def score(self, params, graph, triples):
        padded, codes = self._encoded(params)
        t, n = self._chunk(triples)
        out = self._score(padded["decoder"],
                          padded["relation_embedding"]["W_relation"],
                          codes, t)
        return np.asarray(out)[:n]
