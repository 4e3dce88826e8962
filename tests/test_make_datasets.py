"""Exact-semantics dataset construction tools (reference tools parity:
make_degree_dataset.py / make_single_label_dataset.py /
make_split_dataset.py)."""
import numpy as np
import pytest

from relationprediction_tpu.tools import make_datasets as mk


def _toy_triples(n=200, n_ent=40, n_rel=5, seed=0):
    rng = np.random.default_rng(seed)
    arr = np.stack([
        rng.integers(0, n_ent, n),
        rng.integers(0, n_rel, n),
        rng.integers(0, n_ent, n)], axis=1)
    names = np.array([[f"e{s}", f"r{r}", f"e{o}"] for s, r, o in arr],
                     dtype=object)
    return names


def test_grow_subgraph_connected_and_supersedes_target():
    triples = _toy_triples()
    rng = np.random.default_rng(1)
    idx = mk.grow_subgraph(triples, 50, rng)
    assert len(idx) > 50                       # reference: grows PAST target
    assert len(np.unique(idx)) == len(idx)     # no duplicate edges
    # grown edges all touch the visited-entity set (frontier expansion)
    sub = triples[idx]
    ents = set(sub[:, 0]) | set(sub[:, 2])
    assert all(s in ents and o in ents for s, _, o in sub)


def test_grow_subgraph_degree_cap_excludes_hub_only_edges():
    # star graph: hub h connects to 30 leaves; plus a small chain
    rows = [[f"l{i}", "r", "h"] for i in range(30)]
    rows += [["a", "r", "b"], ["b", "r", "c"], ["c", "r", "a"]]
    triples = np.array(rows, dtype=object)
    rng = np.random.default_rng(0)
    # cap 10 < hub degree 30: hub can never be expanded, so starting from
    # the chain only the 3 chain edges are reachable
    idx = mk.grow_subgraph(triples, 100, rng, degree_cap=10,
                           start_entity="a")
    assert set(idx) == {30, 31, 32}


def test_carve_is_partition():
    triples = _toy_triples(100)
    rng = np.random.default_rng(2)
    rem, carved = mk.carve(triples, 20, rng)
    assert carved.shape == (20, 3)
    assert rem.shape == (80, 3)
    joined = sorted(map(tuple, np.concatenate([rem, carved])))
    assert joined == sorted(map(tuple, triples))


def test_second_order_dataset_semantics():
    # a->b->c and a->d (kept with prob 1): 2nd-order edges from a: {c}
    # (b's successors), plus d's successors (none), b: {}, etc.
    sub = np.array([["a", "r1", "b"], ["b", "r2", "c"], ["a", "r3", "d"]],
                   dtype=object)
    rng = np.random.default_rng(0)
    out = mk.second_order_dataset(sub, rng, keep_prob=1.0)
    assert sorted(map(tuple, out)) == [("a", "2nd_order_edge", "c")]
    # all emitted relations are the single label
    assert set(out[:, 1]) <= {"2nd_order_edge"}


def test_second_order_keep_prob_zero_is_empty():
    sub = np.array([["a", "r1", "b"], ["b", "r2", "c"]], dtype=object)
    out = mk.second_order_dataset(sub, np.random.default_rng(0),
                                  keep_prob=0.0)
    assert out.shape[0] == 0


def test_split_by_entities_partitions_and_respects_entity_atomicity():
    triples = _toy_triples(300, n_ent=60)
    rng = np.random.default_rng(3)
    rem, split = mk.split_by_entities(triples, rng, max_edges=60)
    assert split.shape[0] >= 60
    joined = sorted(map(tuple, np.concatenate([rem, split])))
    assert joined == sorted(map(tuple, triples))
    # entity atomicity: every entity that appears in the split has ALL of
    # its incident edges in the split OR appears in the split only as the
    # far endpoint of a moved entity's edge. The *moved* entities (those
    # that triggered inclusion) have no edges left in rem. At minimum the
    # two sides never share an identical triple:
    assert not (set(map(tuple, rem)) & set(map(tuple, split)))


def test_build_degree_dataset_end_to_end():
    triples = _toy_triples(400, n_ent=50)
    rng = np.random.default_rng(4)
    train, valid, test = mk.build_degree_dataset(
        triples, rng, target_edges=100, degree_cap=200, n_valid=10,
        n_test=10)
    assert valid.shape == (10, 3) and test.shape == (10, 3)
    assert train.shape[0] > 80
    all_rows = set(map(tuple, triples))
    for part in (train, valid, test):
        assert set(map(tuple, part)) <= all_rows


def test_build_split_dataset_end_to_end():
    triples = _toy_triples(300, n_ent=80, seed=9)
    rng = np.random.default_rng(5)
    train, valid, test = mk.build_split_dataset(triples, rng, n_valid=40,
                                                n_test=40)
    assert valid.shape[0] >= 40 and test.shape[0] >= 40
    total = train.shape[0] + valid.shape[0] + test.shape[0]
    assert total == 300


def test_cli_writes_splits(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    triples = _toy_triples(300, n_ent=50)
    with open(src / "train.txt", "w") as f:
        for s, r, o in triples:
            f.write(f"{s}\t{r}\t{o}\n")
    out = tmp_path / "out"
    import sys
    from unittest import mock
    argv = ["make_datasets", "--kind", "degree", "--source", str(src),
            "--folder", str(out), "--edges", "100", "--valid", "10",
            "--test", "10", "--seed", "0"]
    with mock.patch.object(sys, "argv", argv):
        mk.main()
    for name in ("train.txt", "valid.txt", "test.txt"):
        assert (out / name).exists()
    lines = open(out / "valid.txt").read().strip().split("\n")
    assert len(lines) == 10 and all(len(l.split("\t")) == 3 for l in lines)
