"""Standalone evaluation CLI: checkpoint -> metrics + ensemble dumps."""
import dataclasses
import os
import sys

import jax
import numpy as np

from relationprediction_tpu import config as config_lib
from relationprediction_tpu.models import build_model
from relationprediction_tpu.training import checkpoint as ckpt_lib


def test_evaluate_cli_dumps_and_metrics(tmp_path, toy_dataset, monkeypatch):
    ds = toy_dataset
    cfg = config_lib.load("/root/reference/settings/gcn_basis.exp")
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, code_dimension=16,
                                    internal_dimension=16, n_bases=4),
        decoder=dataclasses.replace(cfg.decoder, code_dimension=16),
        training=dataclasses.replace(cfg.training,
                                     experiment_name=str(tmp_path / "m")))
    counted = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    model = build_model(counted)
    params = model.init_params(jax.random.PRNGKey(0))
    ckpt_lib.save(str(tmp_path / "m"), params=params, opt_state={},
                  step=7, rng_key=jax.random.PRNGKey(1),
                  host_rng_state=None)

    # The CLI reads the settings file; write a matching override .exp by
    # pointing at the reference file and overriding dims via a copy.
    exp = tmp_path / "small.exp"
    src = open("/root/reference/settings/gcn_basis.exp").read()
    src = src.replace("CodeDimension=500", "CodeDimension=16")
    src = src.replace("InternalEncoderDimension=500",
                      "InternalEncoderDimension=16")
    src = src.replace("NumberOfBasisFunctions=5",
                      "NumberOfBasisFunctions=4")
    src = src.replace("ExperimentName=models/GcnBlock",
                      f"ExperimentName={tmp_path / 'm'}")
    exp.write_text(src)

    from relationprediction_tpu import evaluate
    dumps = tmp_path / "dumps"
    monkeypatch.setattr(sys, "argv", [
        "rgcn-eval", "--settings", str(exp),
        "--dataset", os.path.join(os.path.dirname(__file__), "..",
                                  "data", "Toy"),
        "--cpu", "--split", "test",
        "--dump-scores", str(dumps / "rgcn"),
        "--dump-degrees", str(dumps / "deg"),
        "--dump-frequencies", str(dumps / "freq")])
    evaluate.main()

    subj = dumps / "rgcn" / "subjects.test"
    obj = dumps / "rgcn" / "objects.test"
    assert subj.exists() and obj.exists()
    # Ensemble-consumable: target " | " tab-separated others, |E|-1 others.
    line = subj.read_text().splitlines()[0]
    target, others = line.split(" | ")
    float(target)
    # "others" excludes ALL known positives for the (o, r) pair — the
    # reference's filtered-dump semantics (``evaluation.py:391-408``) —
    # so it has at most |E| - 1 and at least |E| - known entries.
    assert 1 <= len(others.split("\t")) <= ds.n_entities - 1
    assert (dumps / "deg_in.tsv").exists()
    assert (dumps / "freq_vertex.tsv").exists()

    from relationprediction_tpu.tools import ensemble
    scores = list(ensemble.read_score_file(str(subj)))
    assert len(scores) == len(ds.test)
