"""Pure-functional encoder components.

Each component is an (init, apply) pair over explicit parameter pytrees —
the TPU-native redesign of the reference's chain-of-components Model classes
(``code/model.py``, ``code/encoders/*``). Encoders produce full [V, d]
entity-code matrices per layer (like the reference's
``compute_vertex_embeddings``), so evaluation and training share one code
path; train/test differ only in the graph fed and the dropout flag.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .. import graph as graph_lib
from ..graph import GraphBatch
from ..ops import relblock
from ..ops import staircase as staircase_lib
from ..ops import staircase2 as staircase2_lib
from . import initializers as init


# ---------------------------------------------------------------------------
# Affine transform (embedding table / input / output / projection)
# ---------------------------------------------------------------------------

def init_affine(key, shape, use_bias: bool = True) -> Dict:
    """AffineTransform weights (``affine_transform.py:24-28``)."""
    std = init.glorot_std(shape[0], shape[1])
    params = {"W": init.normal(key, tuple(shape), std)}
    if use_bias:
        params["b"] = init.zeros((shape[1],))
    return params


def apply_affine(params: Dict, x: Optional[jax.Array], *,
                 onehot_input: bool = False, use_bias: bool = True,
                 use_nonlinearity: bool = False) -> jax.Array:
    """``affine_transform.py:33-60``: with one-hot input the weight matrix
    itself is the embedding table; otherwise a dense matmul."""
    if onehot_input or x is None:
        hidden = params["W"]
    else:
        hidden = jnp.dot(x, params["W"], preferred_element_type=jnp.float32)
    if use_bias:
        hidden = hidden + params["b"]
    if use_nonlinearity:
        hidden = jax.nn.relu(hidden)
    return hidden


# ---------------------------------------------------------------------------
# Relation embedding (caps every encoder)
# ---------------------------------------------------------------------------

def init_relation_embedding(key, n_relations: int, dim: int) -> Dict:
    """N(0,1) init (``relation_embedding.py:15-18``)."""
    return {"W_relation": jax.random.normal(key, (n_relations, dim),
                                            dtype=jnp.float32)}


# ---------------------------------------------------------------------------
# Random vertex embedding (ablation input)
# ---------------------------------------------------------------------------

def random_embedding(key, n_vertices: int, dim: int) -> jax.Array:
    """U(-1,1) codes redrawn every call, like the reference's un-materialized
    ``tf.random_uniform`` (``random_vertex_embedding.py:20-24``)."""
    return init.uniform(key, (n_vertices, dim), -1.0, 1.0)


# ---------------------------------------------------------------------------
# Message-passing GCN layers
# ---------------------------------------------------------------------------

GCN_VARIANTS = ("basis", "block", "diag", "basis_plus_diag",
                "basis_times_diag", "only_bias", "basis_stored")


def init_gcn_layer(key, variant: str, *, n_relations: int, d_in: int,
                   d_out: int, n_bases: int, onehot_dim: Optional[int] = None
                   ) -> Dict:
    """Create one message-GCN layer's parameters.

    onehot_dim: entity count when this is a first layer consuming one-hot
    input (``gcn_basis.py:16``: vertex_feature_dimension = entity_count).
    """
    feat_dim = onehot_dim if onehot_dim is not None else d_in
    keys = jax.random.split(key, 8)
    glorot = init.glorot_std(feat_dim, d_out)

    if variant in ("basis", "basis_stored"):
        return {
            "W_forward": init.normal(keys[0], (feat_dim, n_bases, d_out), glorot),
            "W_backward": init.normal(keys[1], (feat_dim, n_bases, d_out), glorot),
            "C_forward": init.normal(keys[2], (n_relations, n_bases), 1.0),
            "C_backward": init.normal(keys[3], (n_relations, n_bases), 1.0),
            "W_self": init.normal(keys[4], (feat_dim, d_out), glorot),
            # NOTE: created but never added in combine_messages — reference
            # quirk preserved for checkpoint/parity (``gcn_basis.py:31,74-88``).
            "b": init.zeros((d_out,)),
        }
    if variant == "block":
        if d_out % n_bases != 0:
            raise ValueError("block variant needs d_out % n_blocks == 0")
        dr = d_out // n_bases
        feat = onehot_dim if onehot_dim is not None else dr
        # glorot over (R, feat) like the reference's odd fan choice
        # (``gcn_basis_concat.py:22``: shape[0]=R, shape[2]=feat_dim).
        g = init.glorot_std(n_relations, feat)
        return {
            "W_forward": init.normal(keys[0], (n_relations, n_bases, feat, dr), g),
            "W_backward": init.normal(keys[1], (n_relations, n_bases, feat, dr), g),
            "W_self": init.normal(keys[4], (d_in, d_out), g),
            "b": init.zeros((d_out,)),  # unused in combine (ref quirk)
        }
    if variant == "diag":
        g = init.glorot_std(d_in, d_out)
        return {
            "D_types_forward": init.normal(keys[0], (n_relations, d_out), 1.0),
            "D_types_backward": init.normal(keys[1], (n_relations, d_out), 1.0),
            "W_self": init.normal(keys[4], (d_in, d_out), g),
            "b": init.zeros((d_out,)),
        }
    if variant == "basis_plus_diag":
        return {
            "W_forward": init.normal(keys[0], (feat_dim, n_bases, d_out), glorot),
            "W_backward": init.normal(keys[1], (feat_dim, n_bases, d_out), glorot),
            "C_forward": init.normal(keys[2], (n_relations, n_bases), 1.0),
            "C_backward": init.normal(keys[3], (n_relations, n_bases), 1.0),
            "D_types_forward": init.normal(keys[5], (n_relations, d_out), 1.0),
            "D_types_backward": init.normal(keys[6], (n_relations, d_out), 1.0),
            "W_self": init.normal(keys[4], (feat_dim, d_out), glorot),
            "b": init.zeros((d_out,)),
        }
    if variant == "basis_times_diag":
        return {
            "W_forward": init.normal(keys[0], (feat_dim, n_bases, d_out), glorot),
            "W_backward": init.normal(keys[1], (feat_dim, n_bases, d_out), glorot),
            "C_forward": init.normal(keys[2], (n_relations, n_bases, d_out), 1.0),
            "C_backward": init.normal(keys[3], (n_relations, n_bases, d_out), 1.0),
            "W_self": init.normal(keys[4], (feat_dim, d_out), glorot),
            "b": init.zeros((d_out,)),
        }
    if variant == "only_bias":
        g = init.glorot_std(n_relations, d_out)
        return {
            "b_forward": init.normal(keys[0], (n_relations, d_out), g),
            "b_backward": init.normal(keys[1], (n_relations, d_out), g),
        }
    raise ValueError(f"unknown gcn variant {variant!r}")


def _edge_chunk(n_edges: int) -> Optional[int]:
    """Largest MXU-friendly chunk size dividing the padded edge count."""
    for c in (512, 256, 128, 64):
        if n_edges % c == 0:
            return c
    return None


def _edge_messages(params: Dict, variant: str, features: Optional[jax.Array],
                   vertices: jax.Array, relations: jax.Array,
                   direction: str, n_bases: int,
                   graph: Optional[GraphBatch] = None) -> jax.Array:
    """Per-edge messages for one direction.

    direction='forward': messages from senders (W_forward/C_forward);
    'backward': messages from receivers (W_backward/C_backward). Relation ids
    are NOT offset for the backward direction — the reference gives inverse
    edges entirely separate weight tensors instead (``gcn_basis.py:43-57``).
    """
    sfx = "forward" if direction == "forward" else "backward"

    if variant in ("basis", "basis_stored", "basis_plus_diag"):
        w_flat = params[f"W_{sfx}"].reshape(params[f"W_{sfx}"].shape[0], -1)
        chunk = _edge_chunk(vertices.shape[0]) if features is not None \
            else None
        if chunk:
            # Dense input: gather [E, d] features once and contract the
            # basis projection chunk-by-chunk on the MXU — avoids
            # materializing the [E, B, d_out] intermediate (2.3x faster at
            # FB15k-237 scale; benchmarks/message_variants_bench.py).
            feats_e = jnp.asarray(features)[vertices]
            coeffs_e = jnp.asarray(params[f"C_{sfx}"])[relations]
            msgs = relblock.basis_messages_chunked(feats_e, w_flat,
                                                   coeffs_e, n_bases,
                                                   chunk=chunk)
        else:
            proj = relblock.basis_vertex_projection(features, w_flat,
                                                    n_bases)
            msgs = relblock.basis_messages(proj, params[f"C_{sfx}"],
                                           vertices, relations)
        if variant == "basis_plus_diag":
            feats = proj_features(features, params, vertices)
            msgs = msgs + feats * params[f"D_types_{sfx}"][relations]
        return msgs

    if variant == "basis_times_diag":
        proj = relblock.basis_vertex_projection(
            features, params[f"W_{sfx}"].reshape(params[f"W_{sfx}"].shape[0], -1),
            n_bases)
        return relblock.basis_messages_scaled(
            proj, params[f"C_{sfx}"], vertices, relations,
            sigmoid_coefficients=True)

    if variant == "block":
        if features is None:
            raise ValueError("block-diagonal layer requires dense input "
                             "(use an input transform before it)")
        if graph is not None and graph.bucket_rel is not None:
            return relblock.block_diag_messages_bucketed(
                features, params[f"W_{sfx}"], vertices, graph.bucket_rel,
                n_bases, graph.bucket_size)
        return relblock.block_diag_messages(
            features, params[f"W_{sfx}"], vertices, relations, n_bases)

    if variant == "diag":
        if features is None:
            raise ValueError("diag layer requires dense input")
        return relblock.diag_messages(features, params[f"D_types_{sfx}"],
                                      vertices, relations)

    if variant == "only_bias":
        return relblock.relation_bias_messages(params[f"b_{sfx}"], relations)

    raise ValueError(f"unknown gcn variant {variant!r}")


def proj_features(features: Optional[jax.Array], params: Dict,
                  vertices: jax.Array) -> jax.Array:
    """Edge-level raw features for the diagonal add-on term
    (``gcn_basis_plus_diag.py:58-61``). With one-hot input the reference
    would multiply indices — only reachable with dense input in practice."""
    if features is None:
        raise ValueError("basis_plus_diag requires dense input features")
    return jnp.asarray(features)[vertices]


def apply_gcn_layer(params: Dict, variant: str, graph: GraphBatch,
                    features: Optional[jax.Array], *, n_bases: int,
                    use_nonlinearity: bool, dropout_keep: float,
                    deterministic: bool, rng: Optional[jax.Array],
                    n_vertices: int,
                    axis_name: Optional[str] = None,
                    agg_dtype=None) -> jax.Array:
    """One R-GCN message-passing layer (template at ``message_gcn.py:49-79``):

      1. per-edge forward messages (from senders) and backward messages
         (from receivers),
      2. self-loop messages with train-time dropout,
      3. 1/degree-normalized aggregation of both directions + self-loop,
      4. optional ReLU.

    features=None means one-hot input (first layer, no input transform).

    axis_name: when set, the GraphBatch's edge arrays are sharded across
    that mesh axis (edge partitioning); each device aggregates its shard
    with globally-precomputed normalization weights and the partial vertex
    sums are psum'd — exactly the reference's full-graph aggregation,
    distributed. Vertex features stay replicated.
    """
    if features is not None:
        features = jnp.asarray(features)

    # Fully-fused v2 path (ops/staircase2.py): gather + relational
    # transform + one-hot scatter in ONE kernel pass per direction; the
    # [E, d] message stream never exists in HBM. Available for the
    # block/basis variants with dense input. Under a mesh (axis_name set)
    # the layouts are shard-local (graph.py sc_shards) — each device runs
    # the fused kernel over its own edge shard with globally-correct
    # weights and the partial [V, d] sums are psum'd, exactly like the
    # segment-sum path.
    if graph.sc2_fwd is not None and features is not None \
            and variant in ("block", "basis"):
        interp = staircase2_lib.default_interpret()
        if variant == "block":
            collected_f = staircase2_lib.block_direction(
                features, params["W_forward"], graph.sc2_fwd, n_bases,
                n_vertices, interp, agg_dtype)
            collected_b = staircase2_lib.block_direction(
                features, params["W_backward"], graph.sc2_bwd, n_bases,
                n_vertices, interp, agg_dtype)
        else:
            wf = params["W_forward"].reshape(
                params["W_forward"].shape[0], -1)
            wb = params["W_backward"].reshape(
                params["W_backward"].shape[0], -1)
            collected_f = staircase2_lib.basis_direction(
                features, wf, params["C_forward"], graph.sc2_fwd, n_bases,
                n_vertices, interp, agg_dtype)
            collected_b = staircase2_lib.basis_direction(
                features, wb, params["C_backward"], graph.sc2_bwd, n_bases,
                n_vertices, interp, agg_dtype)
        combined = collected_f + collected_b
        if axis_name is not None:
            combined = jax.lax.psum(combined, axis_name)
        return _combine_with_self_loop(
            params, variant, features, combined,
            use_nonlinearity=use_nonlinearity, dropout_keep=dropout_keep,
            deterministic=deterministic, rng=rng)

    # The two directions may carry independently-ordered edge copies so
    # each scatter sees sorted target indices (graph.py layout notes).
    b_senders = graph.b_senders if graph.b_senders is not None \
        else graph.senders
    b_relations = graph.b_relations if graph.b_relations is not None \
        else graph.relations
    b_receivers = graph.b_receivers if graph.b_receivers is not None \
        else graph.receivers

    fwd = _edge_messages(params, variant, features, graph.senders,
                         graph.relations, "forward", n_bases, graph)
    bwd = _edge_messages(params, variant, features, b_receivers,
                         b_relations, "backward", n_bases, graph)

    norm = "none" if variant == "basis_stored" else "global"
    if norm == "global" and graph.sc_fwd is not None:
        # Production TPU path: fused permute+weight + staircase one-hot
        # MXU scatter (ops/staircase.py); VJP is a monotone row gather.
        interp = staircase_lib.default_interpret()
        collected_f = staircase_lib.staircase_aggregate(
            fwd, graph.sc_fwd, n_vertices, interp, agg_dtype)
        collected_b = staircase_lib.staircase_aggregate(
            bwd, graph.sc_bwd, n_vertices, interp, agg_dtype)
    else:
        w_f = graph_lib.degree_normalization(graph, "forward", norm)
        if norm == "none":
            w_b = graph.b_mask if graph.b_mask is not None else graph.mask
        elif graph.b_norm is not None:
            w_b = graph.b_norm
        else:
            w_b = graph_lib.degree_normalization(graph, "backward", norm)
        if axis_name is not None and graph.fwd_norm is None \
                and norm == "global":
            raise ValueError("edge-sharded execution requires "
                             "host-precomputed normalization weights in "
                             "the GraphBatch")

        collected_f = graph_lib.aggregate(
            fwd, w_f, graph.receivers, n_vertices,
            indices_are_sorted=graph.fwd_sorted)
        collected_b = graph_lib.aggregate(
            bwd, w_b, b_senders, n_vertices,
            indices_are_sorted=graph.bwd_sorted)
    combined = collected_f + collected_b
    if axis_name is not None:
        combined = jax.lax.psum(combined, axis_name)
    return _combine_with_self_loop(
        params, variant, features, combined,
        use_nonlinearity=use_nonlinearity, dropout_keep=dropout_keep,
        deterministic=deterministic, rng=rng)


def _combine_with_self_loop(params, variant, features, combined, *,
                            use_nonlinearity, dropout_keep, deterministic,
                            rng):
    """Self-loop + bias + nonlinearity tail (``message_gcn.py:49-79``)."""
    if variant == "only_bias":
        # No self-loop (``gcn_only_bias.py:34-35``).
        out = combined
    else:
        self_loop = apply_affine({"W": params["W_self"]}, features,
                                 onehot_input=features is None, use_bias=False)
        if not deterministic:
            # tf.nn.dropout semantics: keep w.p. p, scale kept values by 1/p
            # — applied only to self-loop messages (``message_gcn.py:64``).
            keep = jax.random.bernoulli(rng, dropout_keep, self_loop.shape)
            self_loop = jnp.where(keep, self_loop / dropout_keep, 0.0)
        out = combined + self_loop
        if variant in ("diag", "basis_plus_diag", "basis_times_diag"):
            # These variants add the layer bias (``gcn_diag.py:50``); the
            # basis/block variants create but never add it (ref quirk).
            out = out + params["b"]

    if use_nonlinearity:
        out = jax.nn.relu(out)
    return out


# ---------------------------------------------------------------------------
# Stored-message (incremental) layer state — BasisGcnStore
# ---------------------------------------------------------------------------

def init_stored_state(n_edges_total: int, n_vertices: int, d: int) -> Dict:
    """Zero-initialized message/vertex caches (``gcn_basis_stored.py:33-35``).
    Caches carry one extra phantom row indexed by padding edge ids."""
    return {
        "cached_messages_f": jnp.zeros((n_edges_total + 1, d), jnp.float32),
        "cached_messages_b": jnp.zeros((n_edges_total + 1, d), jnp.float32),
        "cached_vertex_embeddings": jnp.zeros((n_vertices, d), jnp.float32),
    }


def apply_gcn_layer_stored(params: Dict, state: Dict, graph: GraphBatch,
                           features: Optional[jax.Array],
                           edge_ids: jax.Array, *, n_bases: int,
                           use_nonlinearity: bool, dropout_keep: float,
                           deterministic: bool, rng: Optional[jax.Array],
                           n_vertices: int) -> tuple:
    """Train-mode BasisGcnStore layer (``gcn_basis_stored.py:91-112``):
    aggregate only the *delta* between freshly computed batch-edge messages
    and their cached values over UNNORMALIZED incidence, add the cached
    vertex state, then write the caches back. The reference does this with
    scatter_update side-effect ops run by the optimizer
    (``optimize.py:84-86``); here the state is threaded functionally.

    edge_ids: [E_pad] global edge ids of the batch edges (padding -> the
    caches' phantom row). Returns (vertex_embeddings, new_state).
    """
    if features is not None:
        features = jnp.asarray(features)
    fwd = _edge_messages(params, "basis", features, graph.senders,
                         graph.relations, "forward", n_bases, graph)
    bwd = _edge_messages(params, "basis", features, graph.receivers,
                         graph.relations, "backward", n_bases, graph)
    # Padding edges must contribute zero delta AND write zeros to the
    # phantom cache row.
    fwd = fwd * graph.mask[:, None]
    bwd = bwd * graph.mask[:, None]

    fwd_delta = fwd - state["cached_messages_f"][edge_ids] * graph.mask[:, None]
    bwd_delta = bwd - state["cached_messages_b"][edge_ids] * graph.mask[:, None]

    w = graph.mask  # 'none' normalization (gcn_basis_stored.py:87-88)
    collected = (graph_lib.aggregate(fwd_delta, w, graph.receivers,
                                     n_vertices)
                 + graph_lib.aggregate(bwd_delta, w, graph.senders,
                                       n_vertices))
    updated_vertex = collected + state["cached_vertex_embeddings"]

    new_state = {
        "cached_messages_f": state["cached_messages_f"].at[edge_ids].set(fwd),
        "cached_messages_b": state["cached_messages_b"].at[edge_ids].set(bwd),
        "cached_vertex_embeddings": updated_vertex,
    }

    self_loop = apply_affine({"W": params["W_self"]}, features,
                             onehot_input=features is None, use_bias=False)
    if not deterministic:
        keep = jax.random.bernoulli(rng, dropout_keep, self_loop.shape)
        self_loop = jnp.where(keep, self_loop / dropout_keep, 0.0)
    out = updated_vertex + self_loop
    if use_nonlinearity:
        out = jax.nn.relu(out)
    return out, new_state


# ---------------------------------------------------------------------------
# Highway / residual / dropover / variational wrappers
# ---------------------------------------------------------------------------

def init_highway(key, shape) -> Dict:
    """Gate weights; bias init to ones (``highway_layer.py:27-31``)."""
    std = init.glorot_std(shape[0], shape[1])
    return {"W": init.normal(key, tuple(shape), std),
            "b": init.ones((shape[1],))}


def apply_highway(params: Dict, code_new: jax.Array, code_prev: jax.Array
                  ) -> jax.Array:
    """gates * new + (1 - gates) * prev, gate = sigmoid(prev @ W + b)
    (``highway_layer.py:14-38``)."""
    gates = jax.nn.sigmoid(
        jnp.dot(code_prev, params["W"], preferred_element_type=jnp.float32)
        + params["b"])
    return gates * code_new + (1.0 - gates) * code_prev


def apply_residual(code_new: jax.Array, code_prev: jax.Array) -> jax.Array:
    """``residual_layer.py:12-19``. (In the reference builder the residual
    wrapper is immediately overwritten by an if/else quirk at
    ``model_builder.py:302-307``; we implement the documented intent.)"""
    return code_new + code_prev


def apply_dropover(rng: jax.Array, code_1: jax.Array, code_2: jax.Array,
                   deterministic: bool) -> jax.Array:
    """Elementwise random choice between two code matrices at train time,
    first input at test time (``dropover.py:13-24``)."""
    if deterministic:
        return code_1
    choice = jax.random.uniform(rng, code_1.shape, minval=-1.0, maxval=1.0)
    return jnp.where(choice > 0, code_1, code_2)


def apply_variational(rng: jax.Array, mu: jax.Array, log_sigma: jax.Array,
                      deterministic: bool = False) -> jax.Array:
    """Reparameterized z = mu + exp(log_sigma) * eps
    (``variational_encoding.py:14-25``; the reference draws noise in test
    mode too, since the TF random op re-evaluates per run)."""
    eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
    return mu + jnp.exp(log_sigma) * eps


def variational_kl_penalty(mu: jax.Array, log_sigma: jax.Array) -> jax.Array:
    """-0.0005 * sum(1 + 2 log s - mu^2 - exp(2 log s))
    (``variational_encoding.py:27-31``)."""
    return -0.0005 * jnp.sum(1.0 + 2.0 * log_sigma - mu ** 2
                             - jnp.exp(2.0 * log_sigma))
