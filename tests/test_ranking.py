import numpy as np

from relationprediction_tpu.evaluation import ranking
from tests.oracles import numpy_rgcn as oracle


def test_ranks_match_oracle(rng):
    n, v = 12, 50
    scores = rng.standard_normal((n, v)).astype(np.float32)
    golds = rng.integers(0, v, n)
    known_lists = []
    for i in range(n):
        k = rng.integers(1, 8)
        kl = list(np.unique(np.append(rng.integers(0, v, k), golds[i])))
        known_lists.append(kl)

    known_idxs, n_known = ranking.pad_known(known_lists, golds)
    mask = np.ones(v, dtype=np.float32)
    raw, filt = ranking.ranks_from_scores(
        scores, golds, known_idxs, n_known, mask)
    raw, filt = np.asarray(raw), np.asarray(filt)

    for i in range(n):
        want_raw, want_filt = oracle.ranks(scores[i], golds[i],
                                           known_lists[i])
        assert raw[i] == want_raw, i
        assert filt[i] == want_filt, i


def test_entity_padding_excluded(rng):
    n, v, v_pad = 4, 10, 16
    scores = np.full((n, v_pad), 100.0, dtype=np.float32)
    scores[:, :v] = rng.standard_normal((n, v))
    golds = rng.integers(0, v, n)
    known_idxs, n_known = ranking.pad_known([[int(g)] for g in golds], golds)
    mask = np.zeros(v_pad, dtype=np.float32)
    mask[:v] = 1.0
    raw, _ = ranking.ranks_from_scores(scores, golds, known_idxs, n_known,
                                       mask)
    # Padding entities all have score 100 (>= gold) but must not count.
    assert np.all(np.asarray(raw) <= v)


def test_gold_always_rank_ge_1(rng):
    n, v = 8, 30
    scores = rng.standard_normal((n, v)).astype(np.float32)
    golds = rng.integers(0, v, n)
    known_idxs, n_known = ranking.pad_known([[int(g)] for g in golds], golds)
    mask = np.ones(v, dtype=np.float32)
    raw, filt = ranking.ranks_from_scores(scores, golds, known_idxs, n_known,
                                          mask)
    assert np.all(np.asarray(raw) >= 1)
    assert np.all(np.asarray(filt) >= 1)


def test_filtered_removes_known(rng):
    # One row where every better-scoring entity is known: filtered rank = 1.
    scores = np.array([[0.9, 0.8, 0.5, 0.1]], dtype=np.float32)
    golds = np.array([2])
    known = [[0, 1, 2]]
    known_idxs, n_known = ranking.pad_known(known, golds)
    mask = np.ones(4, dtype=np.float32)
    raw, filt = ranking.ranks_from_scores(scores, golds, known_idxs, n_known,
                                          mask)
    assert int(np.asarray(raw)[0]) == 3
    assert int(np.asarray(filt)[0]) == 1


def test_chunked_ranks(rng):
    n, v = 23, 40
    all_scores = rng.standard_normal((n, v)).astype(np.float32)
    triples = np.stack([rng.integers(0, v, n), rng.integers(0, 5, n),
                        rng.integers(0, v, n)], axis=1).astype(np.int32)
    known = {}
    for t in triples:
        known.setdefault((int(t[2]), int(t[1])), []).append(int(t[0]))
    lookup = {tuple(t): i for i, t in enumerate(map(tuple, triples))}

    def score_fn(chunk):
        return np.stack([all_scores[lookup[tuple(t)]] for t in chunk])

    raw, filt = ranking.chunked_ranks(score_fn, triples, gold_col=0,
                                      known_dict=known, key_cols=(2, 1),
                                      n_entities=v, chunk_size=7)
    assert len(raw) == n and len(filt) == n
    for i in (0, 5, 22):
        kl = known[(int(triples[i][2]), int(triples[i][1]))]
        want_raw, want_filt = oracle.ranks(all_scores[i], triples[i][0], kl)
        assert raw[i] == want_raw
        assert filt[i] == want_filt
