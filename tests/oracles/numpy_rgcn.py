"""Straight-line numpy oracle of the reference R-GCN equations.

Implements, edge-by-edge and without any framework machinery, the math of
``code/encoders/message_gcns/*`` and ``code/decoders/*`` as documented in
SURVEY.md §3.2 — used to verify the TPU implementation allclose. Written
from the equations, not the reference code structure.
"""
from __future__ import annotations

import numpy as np


def degree_weights(targets: np.ndarray, n_vertices: int) -> np.ndarray:
    """1/degree weight per edge (sparse softmax of ones per vertex row)."""
    deg = np.bincount(targets, minlength=n_vertices).astype(np.float64)
    return 1.0 / np.maximum(deg[targets], 1.0)


def local_weights(targets: np.ndarray, relations: np.ndarray,
                  n_vertices: int, n_relations: int) -> np.ndarray:
    """1/c_{v,r} weight per edge."""
    out = np.zeros(len(targets))
    counts: dict = {}
    for t, r in zip(targets, relations):
        counts[(t, r)] = counts.get((t, r), 0) + 1
    for i, (t, r) in enumerate(zip(targets, relations)):
        out[i] = 1.0 / counts[(t, r)]
    return out


def aggregate(messages: np.ndarray, weights: np.ndarray, targets: np.ndarray,
              n_vertices: int) -> np.ndarray:
    out = np.zeros((n_vertices, messages.shape[1]))
    for m, w, t in zip(messages, weights, targets):
        out[t] += w * m
    return out


def basis_layer(edges: np.ndarray, features, params: dict, n_vertices: int,
                use_nonlinearity: bool = True, add_bias: bool = False,
                plus_diag: bool = False, times_diag_sigmoid: bool = False
                ) -> np.ndarray:
    """One BasisGcn layer: per-edge basis messages, degree-normalized
    aggregation of both directions, self-loop, optional ReLU.

    features=None -> one-hot input (row-select weight tensors).
    """
    s, r, o = edges[:, 0], edges[:, 1], edges[:, 2]
    W_f, W_b = np.asarray(params["W_forward"]), np.asarray(params["W_backward"])
    W_self = np.asarray(params["W_self"])

    def feat(v):
        if features is None:
            return None
        return features[v]

    def basis_msg(W, C, vertex, rel):
        # sum_b coeff[b] * (x W_b)
        if features is None:
            terms = W[vertex]           # [B, d_out]
        else:
            terms = np.einsum("d,dbo->bo", features[vertex], W)
        coeff = C[rel]
        if times_diag_sigmoid:
            coeff = 1.0 / (1.0 + np.exp(-coeff))  # [B, d_out]
            return np.sum(terms * coeff, axis=0)
        return np.sum(terms * coeff[:, None], axis=0)

    C_f = np.asarray(params["C_forward"])
    C_b = np.asarray(params["C_backward"])

    fwd = np.stack([basis_msg(W_f, C_f, s[i], r[i]) for i in range(len(s))])
    bwd = np.stack([basis_msg(W_b, C_b, o[i], r[i]) for i in range(len(s))])

    if plus_diag:
        D_f = np.asarray(params["D_types_forward"])
        D_b = np.asarray(params["D_types_backward"])
        fwd = fwd + np.stack([features[s[i]] * D_f[r[i]] for i in range(len(s))])
        bwd = bwd + np.stack([features[o[i]] * D_b[r[i]] for i in range(len(s))])

    w_f = degree_weights(o, n_vertices)
    w_b = degree_weights(s, n_vertices)
    collected = aggregate(fwd, w_f, o, n_vertices) + aggregate(bwd, w_b, s,
                                                               n_vertices)

    if features is None:
        self_loop = W_self
    else:
        self_loop = features @ W_self

    out = collected + self_loop
    if add_bias:
        out = out + np.asarray(params["b"])
    if use_nonlinearity:
        out = np.maximum(out, 0.0)
    return out


def block_layer(edges: np.ndarray, features: np.ndarray, params: dict,
                n_vertices: int, n_blocks: int,
                use_nonlinearity: bool = True) -> np.ndarray:
    """One ConcatGcn (block-diagonal) layer."""
    s, r, o = edges[:, 0], edges[:, 1], edges[:, 2]
    W_f, W_b = np.asarray(params["W_forward"]), np.asarray(params["W_backward"])
    W_self = np.asarray(params["W_self"])
    d = features.shape[1]
    dr = d // n_blocks

    def block_msg(W, vertex, rel):
        x = features[vertex].reshape(n_blocks, dr)
        blocks = W[rel]  # [B, dr, dr]
        return np.stack([blocks[b] @ x[b] for b in range(n_blocks)]).reshape(-1)

    fwd = np.stack([block_msg(W_f, s[i], r[i]) for i in range(len(s))])
    bwd = np.stack([block_msg(W_b, o[i], r[i]) for i in range(len(s))])

    w_f = degree_weights(o, n_vertices)
    w_b = degree_weights(s, n_vertices)
    collected = aggregate(fwd, w_f, o, n_vertices) + aggregate(bwd, w_b, s,
                                                               n_vertices)
    out = collected + features @ W_self
    if use_nonlinearity:
        out = np.maximum(out, 0.0)
    return out


def diag_layer(edges: np.ndarray, features: np.ndarray, params: dict,
               n_vertices: int, use_nonlinearity: bool = True) -> np.ndarray:
    """One DiagGcn layer (adds bias, unlike basis/block)."""
    s, r, o = edges[:, 0], edges[:, 1], edges[:, 2]
    D_f = np.asarray(params["D_types_forward"])
    D_b = np.asarray(params["D_types_backward"])

    fwd = features[s] * D_f[r]
    bwd = features[o] * D_b[r]

    w_f = degree_weights(o, n_vertices)
    w_b = degree_weights(s, n_vertices)
    collected = aggregate(fwd, w_f, o, n_vertices) + aggregate(bwd, w_b, s,
                                                               n_vertices)
    out = collected + features @ np.asarray(params["W_self"]) + np.asarray(
        params["b"])
    if use_nonlinearity:
        out = np.maximum(out, 0.0)
    return out


def distmult_energy(e1, r, e2):
    return np.sum(e1 * r * e2, axis=-1)


def complex_energy(e1, r, e2):
    d = e1.shape[-1] // 2
    e1r, e1i = e1[..., :d], e1[..., d:]
    e2r, e2i = e2[..., :d], e2[..., d:]
    rr, ri = r[..., :d], r[..., d:]
    return (np.sum(e1r * rr * e2r, -1) + np.sum(e1i * rr * e2i, -1)
            + np.sum(e1r * ri * e2i, -1) - np.sum(e1i * ri * e2r, -1))


def sigmoid_ce(energies, labels):
    return np.mean(np.maximum(energies, 0) - energies * labels
                   + np.log1p(np.exp(-np.abs(energies))))


def ranks(scores_row: np.ndarray, gold_idx: int, filter_idxs) -> tuple:
    """(raw, filtered) ranks per the reference formula
    (``evaluation.py:151-152``)."""
    gold = scores_row[gold_idx]
    raw = int(np.sum(scores_row >= gold))
    filtered = raw - int(np.sum(scores_row[filter_idxs] >= gold)) + 1
    return raw, filtered
