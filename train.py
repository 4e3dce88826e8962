#!/usr/bin/env python
"""Experiment driver CLI (repo-root shim).

The driver lives in ``relationprediction_tpu.cli`` (installed as the
``rgcn-train`` console script); this shim keeps the reference-style
invocation working from a checkout:

    python train.py --settings settings/gcn_basis.exp --dataset <dir>

(TPU-native counterpart of ``code/train.py`` / ``run-train.sh``.)
"""
from relationprediction_tpu.cli import main

if __name__ == "__main__":
    main()
