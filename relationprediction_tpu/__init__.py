"""TPU-native relational message-passing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
MichSchli/RelationPrediction (R-GCN link prediction, Schlichtkrull et al.
2017): R-GCN encoder family (basis / block-diagonal / diagonal variants),
DistMult / ComplEx / MLP decoders, negative-sampling training with
neighborhood-expansion subgraph batches, raw/filtered MRR evaluation, and
edge-partitioned multi-chip execution over a jax.sharding Mesh.
"""

__version__ = "0.1.0"

from . import config, graph, sampling  # noqa: F401
