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
  * per layer, sender features are assembled with a jnp all_gather over
    the mesh axis (boundary/halo exchange; the all-gather form exchanges
    all rows — a targeted halo exchange that ships only boundary vertices
    is the refinement path, using the same partitioning);
  * aggregation then runs purely locally into the owned vertex rows —
    no psum needed — and activations stay sharded between layers.

Exact numerics: identical math to single-chip, just a different layout.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from .. import graph as graph_lib
from ..graph import GraphBatch
from ..models import encoders as enc
from ..models.build import RGCNModel
from .mesh import EDGE_AXIS


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


class VertexShardedEncoder:
    """Vertex-sharded forward pass for basis-variant GCN encoders.

    Restricted support (round 1): gcn_basis family with an input transform
    (dense features), no skip connections, no variational stage. The
    edge-partitioned path in parallel/mesh.py covers the full surface.
    """

    def __init__(self, model: RGCNModel, mesh: Mesh):
        e = model.config.encoder
        if not (model.is_gcn and e.use_input_transform
                and e.gcn_variant in ("basis",) and
                e.skip_connections == "None"):
            raise ValueError("VertexShardedEncoder supports the basis "
                             "variant with an input transform")
        self.model = model
        self.mesh = mesh
        self.n_shards = mesh.devices.size
        self.rows_per = -(-model.n_entities // self.n_shards)
        self.v_pad = self.rows_per * self.n_shards

    def prepare(self, triples: np.ndarray, pad_to: int):
        """Host-side destination partitioning -> device arrays."""
        f, b, _ = partition_edges_by_destination(
            triples, self.model.n_entities, self.n_shards, pad_to,
            self.model.n_relations)
        return f, b

    def encode_fn(self) -> Callable:
        """shard_map'd encode: params['input_transform']['W'] sharded by
        vertex rows; returns sharded [V_pad/n, d] codes per device."""
        model = self.model
        e = model.config.encoder
        rows_per = self.rows_per
        n_vertices = model.n_entities

        def local_encode(params, f_arrays, b_arrays):
            shard = jax.lax.axis_index(EDGE_AXIS)
            row0 = shard * rows_per
            # shard_map leaves a leading size-1 shard axis on the stacked
            # [n_shards, E] inputs — drop it.
            f_arrays = tuple(a[0] for a in f_arrays)
            b_arrays = tuple(a[0] for a in b_arrays)

            w = params["input_transform"]["W"]          # [rows_per, d] local
            bias = params["input_transform"]["b"]
            feats_local = jax.nn.relu(w + bias)          # [rows_per, d]

            for li, lp in enumerate(params["gcn_layers"]):
                use_nonlinearity = li < e.n_layers - 1
                # Assemble the full sender-feature table (all-gather form
                # of the boundary exchange).
                feats_full = jax.lax.all_gather(
                    feats_local, EDGE_AXIS, tiled=True)  # [V_pad, d]

                f_sen, f_rel, f_rec, f_msk, f_nrm = f_arrays
                b_sen, b_rel, b_rec, b_msk, b_nrm = b_arrays

                fwd = enc._edge_messages(lp, "basis", feats_full, f_sen,
                                         f_rel, "forward", e.n_bases)
                bwd = enc._edge_messages(lp, "basis", feats_full, b_rec,
                                         b_rel, "backward", e.n_bases)

                # Local aggregation into owned rows only.
                f_local = jnp.clip(f_rec - row0, 0, rows_per)
                f_local = jnp.where(f_msk > 0, f_local, rows_per)
                coll_f = jax.ops.segment_sum(fwd * f_nrm[:, None], f_local,
                                             num_segments=rows_per + 1,
                                             indices_are_sorted=True
                                             )[:rows_per]
                b_local = jnp.clip(b_sen - row0, 0, rows_per)
                b_local = jnp.where(b_msk > 0, b_local, rows_per)
                coll_b = jax.ops.segment_sum(bwd * b_nrm[:, None], b_local,
                                             num_segments=rows_per + 1,
                                             indices_are_sorted=True
                                             )[:rows_per]

                self_loop = jnp.dot(feats_local, lp["W_self"],
                                    preferred_element_type=jnp.float32)
                out = coll_f + coll_b + self_loop
                if use_nonlinearity:
                    out = jax.nn.relu(out)
                feats_local = out
            return feats_local

        edge = P(EDGE_AXIS)
        spec_arrays = (edge,) * 5
        # input transform sharded by vertex rows; everything else replicated
        def param_spec(params):
            flat = jax.tree_util.tree_map(lambda _: P(), params)
            it = dict(flat["input_transform"])
            it["W"] = P(EDGE_AXIS)
            flat = dict(flat)
            flat["input_transform"] = it
            return flat

        def wrapped(params, f_arrays, b_arrays):
            return shard_map(
                local_encode, mesh=self.mesh,
                in_specs=(param_spec(params), spec_arrays, spec_arrays),
                out_specs=P(EDGE_AXIS),
                check_vma=False)(params, f_arrays, b_arrays)

        return jax.jit(wrapped)

    def pad_params(self, params):
        """Pad the input-transform table to V_pad rows for even sharding."""
        w = np.asarray(params["input_transform"]["W"])
        pad = self.v_pad - w.shape[0]
        if pad:
            w = np.concatenate([w, np.zeros((pad, w.shape[1]), w.dtype)])
        out = jax.tree_util.tree_map(np.asarray, params)
        out["input_transform"] = dict(out["input_transform"])
        out["input_transform"]["W"] = w
        return out
