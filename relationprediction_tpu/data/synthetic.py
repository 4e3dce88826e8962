"""Synthetic knowledge graphs for benchmarking.

The public distribution of the reference datasets omits the train splits
(``/root/reference/data/.MISSING_LARGE_BLOBS``), and this build environment
has no network egress, so throughput benchmarking at realistic scale uses
synthetic graphs with the same vital statistics (entity/relation counts,
edge counts, power-law degree distribution) as the real datasets.

Correctness tests use the complete ``data/Toy`` fixture instead.
"""
from __future__ import annotations

import numpy as np

from .dataset import KGDataset

# (n_entities, n_relations, n_train, n_valid, n_test) of the real datasets.
# Entity/relation counts verified against the shipped .dict files; edge
# counts are the published split sizes.
PROFILES = {
    "FB15k-237": (14541, 237, 272115, 17535, 20466),
    "FB15k": (14951, 1345, 483142, 50000, 59071),
    "WN18": (40943, 18, 141442, 5000, 5000),
    "Toy-like": (16, 9, 43, 5, 5),
}


def generate(n_entities: int, n_relations: int, n_train: int,
             n_valid: int = 0, n_test: int = 0, seed: int = 0,
             power: float = 0.8, name: str = "synthetic") -> KGDataset:
    """Sample a random multi-relational graph with Zipfian vertex popularity
    (real KGs are heavy-tailed; uniform graphs would understate gather/scatter
    irregularity in benchmarks)."""
    rng = np.random.default_rng(seed)
    n_total = n_train + n_valid + n_test

    # Zipf-ish popularity over entities and relations.
    ent_w = 1.0 / np.arange(1, n_entities + 1) ** power
    ent_w /= ent_w.sum()
    rel_w = 1.0 / np.arange(1, n_relations + 1) ** 1.0
    rel_w /= rel_w.sum()

    ent_perm = rng.permutation(n_entities)
    rel_perm = rng.permutation(n_relations)

    s = ent_perm[rng.choice(n_entities, size=n_total, p=ent_w)]
    o = ent_perm[rng.choice(n_entities, size=n_total, p=ent_w)]
    r = rel_perm[rng.choice(n_relations, size=n_total, p=rel_w)]

    triples = np.stack([s, r, o], axis=1).astype(np.int32)
    train = triples[:n_train]
    valid = triples[n_train:n_train + n_valid]
    test = triples[n_train + n_valid:]

    return KGDataset(
        name=name,
        entities={i: f"e{i}" for i in range(n_entities)},
        relations={i: f"r{i}" for i in range(n_relations)},
        train=train, valid=valid, test=test,
    )


def like(profile: str, seed: int = 0) -> KGDataset:
    """Generate a synthetic dataset with the vital statistics of a named
    real dataset (see PROFILES)."""
    ne, nr, ntr, nva, nte = PROFILES[profile]
    return generate(ne, nr, ntr, nva, nte, seed=seed,
                    name=f"synth-{profile}")


def _draw_teacher_factors(rng, n_entities, n_relations, latent_dim):
    """The generator's FIRST draws — the single definition of the draw
    order, shared by ``learnable`` and ``teacher_factors`` so
    teacher-ceiling evaluations can never drift from the data."""
    ent = rng.standard_normal((n_entities, latent_dim))
    rel = rng.standard_normal((n_relations, latent_dim))
    return ent, rel


def teacher_factors(n_entities: int, n_relations: int, *,
                    latent_dim: int = 8, seed: int = 0):
    """The ground-truth latent factors behind ``learnable(...)`` with the
    same arguments — for evaluating the teacher's own scores (the
    Bayes-representable ceiling) through the production Scorer."""
    return _draw_teacher_factors(np.random.default_rng(seed), n_entities,
                                 n_relations, latent_dim)


def learnable(n_entities: int, n_relations: int, n_train: int,
              n_valid: int = 0, n_test: int = 0, *, latent_dim: int = 8,
              temperature: float = 2.0, seed: int = 0,
              name: str = "synth-learnable") -> KGDataset:
    """Sample a KG from a ground-truth DistMult distribution.

    Entities/relations get latent factors; object entities are drawn
    categorically from softmax(score(s, r, .) / T). Data generated this way
    is provably learnable by the model family, so trained filtered MRR well
    above 1/|E| demonstrates end-to-end learning without the (unavailable)
    public splits. Uniform-random graphs (``generate``) carry no signal and
    are only useful for throughput benchmarking.
    """
    rng = np.random.default_rng(seed)
    ent, rel = _draw_teacher_factors(rng, n_entities, n_relations,
                                     latent_dim)

    n_total = n_train + n_valid + n_test
    s = rng.integers(0, n_entities, n_total)
    r = rng.integers(0, n_relations, n_total)

    o = np.empty(n_total, dtype=np.int64)
    chunk = 4096
    for i in range(0, n_total, chunk):
        sc, rc = s[i:i + chunk], r[i:i + chunk]
        logits = (ent[sc] * rel[rc]) @ ent.T / temperature   # [c, V]
        logits -= logits.max(axis=1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(axis=1, keepdims=True)
        cum = np.cumsum(p, axis=1)
        u = rng.random((len(sc), 1))
        o[i:i + chunk] = (cum < u).sum(axis=1)

    triples = np.stack([s, r, o], axis=1).astype(np.int32)
    train = triples[:n_train]
    valid = triples[n_train:n_train + n_valid]
    test = triples[n_train + n_valid:]
    return KGDataset(
        name=name,
        entities={i: f"e{i}" for i in range(n_entities)},
        relations={i: f"r{i}" for i in range(n_relations)},
        train=train, valid=valid, test=test,
    )
