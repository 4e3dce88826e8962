"""Offline tools (ensemble, dictionaries, subgraph, cluster).

Submodules are imported lazily so ``python -m
relationprediction_tpu.tools.<tool>`` runs without double-import warnings.
"""
