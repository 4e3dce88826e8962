"""The vendored real-dataset splits load cleanly through the IO layer.

The environment ships only what the reference repo ships (no egress):
FB-Toutanova valid/test + dicts, FB15k valid + dicts, wn18 valid/test +
dicts, and the full Toy dataset.  These tests pin the exact universe and
split sizes so the repo is ready the moment a train split appears.
"""
import os

import numpy as np
import pytest

from relationprediction_tpu.data import io

DATA = os.path.join(os.path.dirname(__file__), "..", "data")


def _load(dataset, split):
    d = os.path.join(DATA, dataset)
    path = os.path.join(d, split + ".txt")
    if not os.path.exists(path):
        pytest.skip(f"{dataset}/{split} not vendored")
    return io.read_triplets_as_array(
        path,
        os.path.join(d, "entities.dict"),
        os.path.join(d, "relations.dict"),
    )


@pytest.mark.parametrize(
    "dataset,split,n_triples,n_entities,n_relations",
    [
        ("FB-Toutanova", "valid", 17535, 14541, 237),
        ("FB-Toutanova", "test", 20466, 14541, 237),
        ("FB15k", "valid", 50000, 14951, 1345),
        ("wn18", "valid", 5000, 40943, 18),
        ("wn18", "test", 5000, 40943, 18),
        ("Toy", "train", 43, 16, 9),
    ],
)
def test_vendored_split(dataset, split, n_triples, n_entities, n_relations):
    triples = _load(dataset, split)
    assert triples.shape == (n_triples, 3)
    assert triples.dtype == np.int32
    # All ids fall inside the dictionary universe.
    ents = io.read_dictionary(os.path.join(DATA, dataset, "entities.dict"))
    rels = io.read_dictionary(os.path.join(DATA, dataset, "relations.dict"))
    assert len(ents) == n_entities and len(rels) == n_relations
    assert triples[:, [0, 2]].max() < n_entities
    assert triples[:, 1].max() < n_relations
    assert triples.min() >= 0
