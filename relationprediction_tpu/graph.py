"""Static-shape edge-batch representation of a relational message graph.

TPU-native replacement for the reference's ``MessageGraph`` sparse incidence
matrices (``code/extras/graph_representations.py:69-147``). XLA wants static
shapes and segment ops, so instead of building V x E ``tf.SparseTensor``s per
step we carry a padded edge list plus precomputable normalization weights:

  * ``forward_incidence_matrix('global') @ messages`` in the reference is a
    sparse softmax of ones per receiver row (== 1/in-degree) followed by SpMM.
    Here that is ``segment_sum(messages * w_fwd, receivers)`` with
    ``w_fwd[e] = 1 / deg_recv[receivers[e]]`` — elementwise identical.
  * 'local' normalization (per (relation, vertex) softmax then relation-sum,
    ``graph_representations.py:95-107``) becomes
    ``w[e] = 1 / count(receivers[e], relations[e])``.
  * 'none' is unit weights.

Padding: edges beyond ``n_edges`` point at a phantom vertex row (index
``n_vertices``), so ``segment_sum(..., num_segments=n_vertices + 1)`` drops
them without masking arithmetic in the hot loop.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class GraphBatch(NamedTuple):
    """A padded, fixed-shape batch of typed directed edges.

    senders/relations/receivers: int32 [E_pad]; padding entries have
    sender == receiver == n_vertices and relation == 0.
    mask: float32 [E_pad], 1.0 for real edges.
    n_vertices: number of real vertices (python int — static under jit).
    n_relations: number of relation types (static).
    """

    senders: jax.Array
    relations: jax.Array
    receivers: jax.Array
    mask: jax.Array
    n_vertices: int
    n_relations: int

    @property
    def n_padded_edges(self) -> int:
        return self.senders.shape[0]


# Register n_vertices / n_relations as static aux data so GraphBatch can
# cross jit boundaries without retracing on array identity.
jax.tree_util.register_pytree_node(
    GraphBatch,
    lambda g: ((g.senders, g.relations, g.receivers, g.mask),
               (g.n_vertices, g.n_relations)),
    lambda aux, children: GraphBatch(*children, *aux),
)


def build_graph_batch(triples: np.ndarray, n_vertices: int, n_relations: int,
                      pad_to: Optional[int] = None) -> GraphBatch:
    """Host-side construction of a GraphBatch from an [N, 3] (s, r, o) array.

    ``pad_to`` fixes the edge-array length so that repeated calls with
    varying edge counts hit one compiled executable.
    """
    triples = np.asarray(triples, dtype=np.int32).reshape(-1, 3)
    n = triples.shape[0]
    e_pad = pad_to if pad_to is not None else n
    if e_pad < n:
        raise ValueError(f"pad_to={e_pad} smaller than edge count {n}")

    senders = np.full((e_pad,), n_vertices, dtype=np.int32)
    relations = np.zeros((e_pad,), dtype=np.int32)
    receivers = np.full((e_pad,), n_vertices, dtype=np.int32)
    mask = np.zeros((e_pad,), dtype=np.float32)

    senders[:n] = triples[:, 0]
    relations[:n] = triples[:, 1]
    receivers[:n] = triples[:, 2]
    mask[:n] = 1.0

    return GraphBatch(
        senders=jnp.asarray(senders),
        relations=jnp.asarray(relations),
        receivers=jnp.asarray(receivers),
        mask=jnp.asarray(mask),
        n_vertices=int(n_vertices),
        n_relations=int(n_relations),
    )


def degree_normalization(graph: GraphBatch, direction: str = "forward",
                         normalization: str = "global") -> jax.Array:
    """Per-edge aggregation weights, matching the reference's incidence-matrix
    normalizations (``graph_representations.py:69-147``).

    direction='forward' normalizes messages delivered to receivers;
    'backward' normalizes messages delivered to senders.

    Returns float32 [E_pad]; padding edges get weight 0.
    """
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
        pair = target.astype(jnp.int64) * graph.n_relations + graph.relations
        n_pairs = (graph.n_vertices + 1) * graph.n_relations
        cnt = jax.ops.segment_sum(graph.mask, pair, num_segments=n_pairs)
        w = 1.0 / jnp.maximum(cnt[pair], 1.0)
        return w * graph.mask

    raise ValueError(f"unknown normalization {normalization!r}")


def aggregate(messages: jax.Array, edge_weights: jax.Array,
              targets: jax.Array, n_vertices: int) -> jax.Array:
    """Normalized message aggregation: the segment-op equivalent of
    ``tf.sparse_tensor_dense_matmul(incidence, messages)``
    (e.g. ``gcn_basis.py:78-79``).

    messages: [E_pad, d]; edge_weights: [E_pad]; targets: [E_pad] int32 in
    [0, n_vertices] (n_vertices = phantom padding row). Returns [V, d].
    """
    weighted = messages * edge_weights[:, None]
    out = jax.ops.segment_sum(weighted, targets, num_segments=n_vertices + 1)
    return out[:n_vertices]
