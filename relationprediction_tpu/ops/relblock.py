"""Relational per-edge message transforms.

These are the TPU-native equivalents of the reference's per-edge message
math (``gcn_basis.py:39-72``, ``gcn_basis_concat.py:35-52``), restructured so
the heavy contraction lands on the MXU:

  * Basis decomposition: the reference computes, per edge e with sender s
    and relation r:  m_e = sum_b C[r, b] * (x_s W_b). We hoist the basis
    projection to the vertex level (one big [V, d] x [d, B*d_out] matmul),
    then gather per edge and contract the B axis with gathered coefficients.
    Mathematically identical (matmul and gather commute), but the matmul is
    one large MXU-friendly GEMM instead of an edge-replicated one.

  * Block-diagonal: m_e = blockdiag(W[r_e]) x_s. Weights depend on the
    relation, so there is no vertex-level hoist; the baseline gathers the
    [B, dr, dr] block stack per edge and contracts with an einsum. A
    relation-segmented Pallas kernel replaces this on the hot path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def basis_vertex_projection(features, w_flat, n_bases: int):
    """[V, d_in] x [d_in, B * d_out] -> [V, B, d_out].

    features=None means one-hot input (first layer without input transform,
    ``shared_functions.dot_or_lookup``): the projection is the weight itself.
    """
    w_flat = jnp.asarray(w_flat)
    if features is None:
        proj = w_flat
    else:
        proj = jnp.dot(jnp.asarray(features), w_flat,
                       preferred_element_type=jnp.float32)
    v = proj.shape[0]
    return proj.reshape(v, n_bases, -1)


def basis_messages(proj, coefficients, edge_vertices, edge_relations):
    """Per-edge basis-combined messages.

    proj: [V, B, d_out] vertex-level basis projections.
    coefficients: [R, B] per-relation basis coefficients (C_forward/backward).
    edge_vertices: [E] int32 source vertex per message.
    edge_relations: [E] int32 relation per message.
    Returns [E, d_out]: sum_b C[r_e, b] * proj[v_e, b, :].
    """
    edge_proj = jnp.asarray(proj)[edge_vertices]            # [E, B, d_out]
    edge_coef = jnp.asarray(coefficients)[edge_relations]   # [E, B]
    return jnp.einsum("eb,ebd->ed", edge_coef, edge_proj)


def basis_messages_scaled(proj, coefficients, edge_vertices, edge_relations,
                          sigmoid_coefficients: bool = False):
    """Variant with full [R, B, d_out] coefficient tensors, optionally passed
    through a sigmoid (BasisGcnTimesDiag, ``gcn_basis_times_diag.py:44-57``)."""
    edge_proj = jnp.asarray(proj)[edge_vertices]            # [E, B, d]
    edge_coef = jnp.asarray(coefficients)[edge_relations]   # [E, B, d]
    if sigmoid_coefficients:
        edge_coef = jax.nn.sigmoid(edge_coef)
    return jnp.sum(edge_proj * edge_coef, axis=1)


def block_diag_messages(features, blocks, edge_vertices, edge_relations,
                        n_blocks: int):
    """Block-diagonal per-edge transform (ConcatGcn,
    ``gcn_basis_concat.py:35-52``).

    features: [V, d] with d = n_blocks * dr.
    blocks: [R, n_blocks, dr, dr] per-relation block stacks.
    Returns [E, d]: for edge e, block b: y[b] = W[r_e, b] @ x[v_e, b].

    Note the reference computes ``matmul(W, x[..., None])`` i.e. y = W @ x
    (x contracted against W's *columns*).
    """
    features = jnp.asarray(features)
    d = features.shape[1]
    dr = d // n_blocks
    x = features[edge_vertices].reshape(-1, n_blocks, dr)   # [E, B, dr]
    w = jnp.asarray(blocks)[edge_relations]                 # [E, B, dr, dr]
    y = jnp.einsum("ebij,ebj->ebi", w, x)
    return y.reshape(-1, d)


def block_diag_messages_bucketed(features, blocks, edge_vertices, bucket_rel,
                                 n_blocks: int, bucket_size: int):
    """Relation-bucketed block-diagonal transform.

    Requires the GraphBatch's bucketed layout: edges sorted by relation and
    padded so each run of ``bucket_size`` consecutive edges shares one
    relation (bucket_rel[b]). Each relation's [B, dr, dr] block stack is
    then loaded once per bucket instead of once per edge — cutting weight
    traffic by bucket_size x (the per-edge gather at FB15k-237 scale moves
    ~hundreds of GB per layer; this moves ~n_buckets * B * dr^2 floats).

    features: [V(+1 phantom ok via clamp), d]; blocks: [R, B, dr, dr];
    edge_vertices: [E] int32 in bucketed order; bucket_rel: [E/bucket_size].
    Returns [E, d] messages in bucketed edge order.
    """
    features = jnp.asarray(features)
    d = features.shape[1]
    dr = d // n_blocks
    nb = edge_vertices.shape[0] // bucket_size
    x = features[edge_vertices].reshape(nb, bucket_size, n_blocks, dr)
    w = jnp.asarray(blocks)[bucket_rel]                     # [nb, B, dr, dr]
    y = jnp.einsum("ntbj,nbij->ntbi", x, w)
    return y.reshape(-1, d)


def block_diag_messages_bucketed_unrolled(features, blocks, edge_vertices,
                                          bucket_rel, n_blocks: int,
                                          bucket_size: int):
    """Bucketed block-diagonal transform with the dr x dr contraction
    unrolled into elementwise multiply-adds.

    The einsum form lowers to [T, dr] x [dr, dr] batched matmuls whose
    K=N=dr (5 for the paper model) waste almost the entire MXU tile; with
    dr small it is faster to broadcast each W[..., i, j] scalar across the
    bucket and fuse dr^2 VPU multiply-adds.
    """
    features = jnp.asarray(features)
    d = features.shape[1]
    dr = d // n_blocks
    nb = edge_vertices.shape[0] // bucket_size
    x = features[edge_vertices].reshape(nb, bucket_size, n_blocks, dr)
    w = jnp.asarray(blocks)[bucket_rel]                # [nb, B, dr, dr]
    wb = w[:, None]                                    # [nb, 1, B, dr, dr]
    y = jnp.stack(
        [sum(wb[..., i, j] * x[..., j] for j in range(dr))
         for i in range(dr)], axis=-1)                 # [nb, T, B, dr]
    return y.reshape(-1, d)


def basis_messages_chunked(features_gathered, w_flat, edge_coeffs,
                           n_bases: int, chunk: int = 512):
    """Per-edge basis messages without materializing the [E, B, d_out]
    intermediate: process edges in chunks, each chunk's basis projection
    ([chunk, B*d_out], ~5 MB) contracts with its coefficients immediately.

    features_gathered: [E, d_in] (sender/receiver features per edge);
    w_flat: [d_in, B * d_out]; edge_coeffs: [E, B].
    Trades the vertex-hoisted projection's 1.3 GB gather traffic for
    E*d_in*B*d_out MXU FLOPs with only [E, d] streaming traffic.
    """
    e, d_in = features_gathered.shape
    d_out = w_flat.shape[1] // n_bases
    if e % chunk != 0:
        raise ValueError(f"edge count {e} not a multiple of chunk {chunk}")
    xc = features_gathered.reshape(-1, chunk, d_in)
    cc = edge_coeffs.reshape(-1, chunk, n_bases)

    def per_chunk(args):
        x_c, c_c = args
        t = jnp.dot(x_c, w_flat, preferred_element_type=jnp.float32)
        t = t.reshape(chunk, n_bases, d_out)
        return jnp.einsum("eb,ebd->ed", c_c, t)

    out = jax.lax.map(per_chunk, (xc, cc))
    return out.reshape(e, d_out)


def diag_messages(features, diags, edge_vertices, edge_relations):
    """Per-relation diagonal scaling (DiagGcn, ``gcn_diag.py:30-38``):
    m_e = x_{v_e} * D[r_e]."""
    return jnp.asarray(features)[edge_vertices] * jnp.asarray(diags)[edge_relations]


def relation_bias_messages(biases, edge_relations):
    """Messages that are purely per-relation bias vectors (OnlyBiasGcn,
    ``gcn_only_bias.py:27-32``)."""
    return jnp.asarray(biases)[edge_relations]
