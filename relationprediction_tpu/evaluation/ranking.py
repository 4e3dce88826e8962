"""On-device raw/filtered rank computation.

The reference computes ranks with a per-triple numpy loop over [N, V] score
rows (``evaluation.py:349-389``) — at TPU speeds that host loop dominates
evaluation, so here the whole rank computation stays on device:

  raw rank      = #{v : score[v] >= score[gold]}           (evaluation.py:151)
  filtered rank = raw - #{known v : score[v] >= gold} + 1  (evaluation.py:152)

Known-entity sets are ragged; they are padded host-side to a [N, K] index
matrix using the gold index as filler. Since score[gold] >= score[gold] is
always true, each filler contributes exactly 1 to the known-count, which we
subtract back out — no masking needed in the kernel.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pad_known(known_lists: Sequence[Sequence[int]], golds: Sequence[int],
              pad_to_multiple: int = 64) -> Tuple[np.ndarray, np.ndarray]:
    """Pad ragged known-entity index lists into [N, K] (filler = gold idx).

    Returns (padded_idxs [N, K] int32, n_real [N] int32).
    """
    n = len(known_lists)
    k = max((len(kl) for kl in known_lists), default=1)
    k = max(k, 1)
    k = -(-k // pad_to_multiple) * pad_to_multiple
    out = np.empty((n, k), dtype=np.int32)
    n_real = np.empty((n,), dtype=np.int32)
    for i, (kl, g) in enumerate(zip(known_lists, golds)):
        m = len(kl)
        out[i, :m] = kl
        out[i, m:] = g
        n_real[i] = m
    return out, n_real


@jax.jit
def ranks_from_scores(scores: jax.Array, gold_idx: jax.Array,
                      known_idxs: jax.Array, n_known: jax.Array,
                      entity_mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Compute (raw, filtered) ranks for a chunk.

    scores: [N, V_pad] candidate scores (monotonic transform of energies ok).
    gold_idx: [N] gold entity per row.
    known_idxs: [N, K] known-entity indices padded with gold_idx.
    n_known: [N] real known counts.
    entity_mask: [V_pad] 1.0 for real entities (phantom padding rows of the
      entity table must not participate in ranking).
    Returns int32 [N], [N].
    """
    n = scores.shape[0]
    rows = jnp.arange(n)
    gold_scores = scores[rows, gold_idx]                      # [N]

    ge = (scores >= gold_scores[:, None]) & (entity_mask[None, :] > 0)
    raw = jnp.sum(ge, axis=1).astype(jnp.int32)               # [N]

    known_scores = jnp.take_along_axis(scores, known_idxs, axis=1)  # [N, K]
    known_ge = jnp.sum(known_scores >= gold_scores[:, None],
                       axis=1).astype(jnp.int32)
    n_fill = known_idxs.shape[1] - n_known
    known_ge = known_ge - n_fill  # fillers are gold => each counted once

    filtered = raw - known_ge + 1
    return raw, filtered


def chunked_ranks(score_fn, triples: np.ndarray, gold_col: int,
                  known_dict: Dict[Tuple[int, int], List[int]],
                  key_cols: Tuple[int, int], n_entities: int,
                  chunk_size: int = 1000,
                  entity_pad: int | None = None
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Evaluate ranks for all triples in fixed-size chunks.

    score_fn(chunk [C, 3]) -> [C, V_pad] scores on device.
    gold_col: 0 for subject prediction, 2 for object prediction.
    known_dict: {(key_entity, relation): [known gold-col entities]}.
    key_cols: the (entity, relation) columns forming the dict key —
      (2, 1) for subjects, (0, 1) for objects (``evaluation.py:360,380``).
    """
    n = len(triples)
    raws, filts = [], []
    v_pad = entity_pad if entity_pad is not None else n_entities
    entity_mask = np.zeros((v_pad,), dtype=np.float32)
    entity_mask[:n_entities] = 1.0
    entity_mask = jnp.asarray(entity_mask)

    for start in range(0, n, chunk_size):
        chunk = triples[start:start + chunk_size]
        c = len(chunk)
        padded_chunk = chunk
        if c < chunk_size:
            # Keep the device shape static: repeat the last row.
            padded_chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], chunk_size - c, axis=0)])
        scores = score_fn(padded_chunk)

        golds = padded_chunk[:, gold_col]
        known_lists = [known_dict[(int(t[key_cols[0]]), int(t[key_cols[1]]))]
                       for t in padded_chunk]
        known_idxs, n_known = pad_known(known_lists, golds)

        raw, filt = ranks_from_scores(scores, jnp.asarray(golds),
                                      jnp.asarray(known_idxs),
                                      jnp.asarray(n_known), entity_mask)
        raws.append(np.asarray(raw)[:c])
        filts.append(np.asarray(filt)[:c])

    return np.concatenate(raws), np.concatenate(filts)
