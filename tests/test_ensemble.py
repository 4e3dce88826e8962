"""Tests for the R-GCN+ ensemble tool (tools/ensemble.py)."""
import numpy as np

from relationprediction_tpu.tools import ensemble


def write_degrees(folder, in_rows, out_rows):
    folder.mkdir(parents=True, exist_ok=True)
    for name, rows in (("degrees.in", in_rows), ("degrees.out", out_rows)):
        with open(folder / name, "w") as f:
            for d, m in rows:
                f.write(f"{d}\t{m}\n")


def write_scores(folder, name, rows):
    folder.mkdir(parents=True, exist_ok=True)
    with open(folder / name, "w") as f:
        for target, others in rows:
            f.write(f"{target} | " + "\t".join(str(x) for x in others)
                    + "\n")


def test_cutoff_ensemble_routes_by_total_degree(tmp_path):
    # triple 0: total degree 3 (< cutoff 10) -> model 1's mrrs
    # triple 1: total degree 30 (>= 10)      -> model 2's mrrs
    write_degrees(tmp_path / "m1", [(1, 0.5), (10, 0.2)],
                  [(2, 0.25), (20, 0.1)])
    write_degrees(tmp_path / "m2", [(1, 0.9), (10, 0.8)],
                  [(2, 0.7), (20, 0.6)])
    e = ensemble.CutoffEnsemble(10, str(tmp_path / "m1"),
                                str(tmp_path / "m2"))
    e.compute_ranks()
    np.testing.assert_allclose(e.mrrs, [0.5, 0.25, 0.8, 0.6])
    np.testing.assert_allclose(e.combined_mrr(), np.mean([0.5, 0.25, 0.8,
                                                          0.6]))
    # hits@k from per-triple mrrs: mrr >= 1/k
    np.testing.assert_allclose(e.hits_at(1), 0.0)    # none reach 1.0
    np.testing.assert_allclose(e.hits_at(2), 0.75)   # 0.5, 0.8, 0.6 >= 0.5
    np.testing.assert_allclose(e.hits_at(4), 1.0)    # all >= 0.25


def test_weight_ensemble_ranks(tmp_path):
    # model 1 scores the gold highest; model 2 inverts; weight 1.0 -> model
    # 1 decides, rank 1 for each triple.
    write_scores(tmp_path / "m1", "subjects.test",
                 [(0.9, [0.1, 0.2]), (0.8, [0.0, 0.5])])
    write_scores(tmp_path / "m1", "objects.test", [(0.7, [0.2, 0.1])])
    write_scores(tmp_path / "m2", "subjects.test",
                 [(0.1, [0.9, 0.8]), (0.2, [0.9, 0.6])])
    write_scores(tmp_path / "m2", "objects.test", [(0.3, [0.8, 0.9])])

    e = ensemble.WeightEnsemble(1.0, str(tmp_path / "m1"),
                                str(tmp_path / "m2"))
    e.compute_ranks()
    np.testing.assert_array_equal(e.ranks, [1, 1, 1])
    assert e.combined_mrr() == 1.0

    e0 = ensemble.WeightEnsemble(0.0, str(tmp_path / "m1"),
                                 str(tmp_path / "m2"))
    e0.compute_ranks()
    np.testing.assert_array_equal(e0.ranks, [3, 3, 3])
