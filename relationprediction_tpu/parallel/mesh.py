"""Multi-chip execution: edge-partitioned training over a device mesh.

The reference has no distributed execution at all (single tf.Session,
``train.py:278``; SURVEY.md §2 parallelism statement). This module is the
TPU-native scale-out design:

  * mesh axis "edges": the knowledge graph's edge batch AND the negative-
    sampled loss triples are sharded across devices (the graph analogue of
    combined data+sequence parallelism);
  * entity/relation/layer parameters are replicated (they are small relative
    to edge traffic: [R, B] coefficients, [d, B*d] basis stacks);
  * each device segment-sums its edge shard with host-precomputed global
    normalization weights; one psum per GCN layer reconstitutes the exact
    full-graph aggregation (mathematically identical to single-chip);
  * loss and gradients are reduced with psum inside the step, so the update
    applied on every device is bit-identical and params stay replicated.

Collectives ride ICI via XLA; there is no host-mediated communication.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax>=0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map  # type: ignore

from ..graph import GraphBatch
from ..models.build import RGCNModel

EDGE_AXIS = "edges"


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
    """1-D mesh over the edge-partition axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (EDGE_AXIS,))


def _graph_specs(graph: Optional[GraphBatch]):
    """PartitionSpec pytree for a GraphBatch: every per-edge (and
    per-bucket / per-chunk) array sharded on its leading axis."""
    if graph is None:
        return None
    leaves, treedef = jax.tree_util.tree_flatten(graph)
    return jax.tree_util.tree_unflatten(treedef,
                                        [P(EDGE_AXIS)] * len(leaves))


def _mesh_compatible(graph: Optional[GraphBatch], n_devices: int
                     ) -> Optional[GraphBatch]:
    """Drop staircase layouts that were not built for this mesh size.

    A staircase layout (v1 or fused v2) is only shardable when it was
    built with ``sc_shards == n_devices`` — each device's layout must
    reference its own contiguous edge shard. Otherwise fall back to the
    segment-sum aggregation, which is exact under edge sharding."""
    if graph is None:
        return graph
    if graph.sc2_fwd is not None \
            and graph.sc2_fwd.fwd.shards != n_devices:
        graph = graph._replace(sc2_fwd=None, sc2_bwd=None)
    if graph.sc_fwd is None:
        return graph
    if graph.sc_fwd.shards == n_devices:
        return graph
    return graph._replace(sc_fwd=None, sc_bwd=None)


def make_sharded_train_step(model: RGCNModel, optimizer, mesh: Mesh,
                            has_graph: bool = True,
                            negative_mode: Optional[str] = None,
                            negative_rate: int = 10,
                            negative_pool_size: int = 512) -> Callable:
    """Build the jitted multi-chip training step.

    Signature: step(params, opt_state, graph, triples, labels, mask, rng)
      -> (params, opt_state, loss)

    params/opt_state replicated; graph edge arrays and triples/labels/mask
    sharded along EDGE_AXIS (leading dim divisible by mesh size). The loss
    returned is the exact global scalar.

    negative_mode: None expects pre-tiled (host-side) negatives in
    triples/labels/mask. 'binomial' / 'split' / 'shared' corrupt the
    sharded positive batch ON DEVICE inside the step (triples then carries
    positives only, labels is unused); the corruption RNG is folded with
    the device's mesh position so every shard draws independent negatives
    ('shared' uses one replicated pool by construction).
    """
    from ..training.device_sampling import (device_negative_entities_split,
                                            device_negative_parts,
                                            device_negative_sample)
    n_entities = model.n_entities
    factorizable = getattr(model.decoder, "factorizable", False)

    def step(params, opt_state, graph, triples, labels, mask, rng):
        def loss_fn(p):
            if negative_mode is None:
                return model.loss(p, graph, triples, labels, mask, rng=rng,
                                  deterministic=False, axis_name=EDGE_AXIS)
            shard_rng = jax.random.fold_in(
                jax.random.fold_in(rng, 777),
                jax.lax.axis_index(EDGE_AXIS))
            if negative_mode == "shared":
                pool = jax.random.randint(  # same pool on every device
                    jax.random.fold_in(rng, 778), (negative_pool_size,),
                    0, n_entities, dtype=triples.dtype)
                return model.loss_shared_negatives(
                    p, graph, triples, mask, pool, rng=rng,
                    deterministic=False, axis_name=EDGE_AXIS)
            if negative_mode == "split":
                neg_s, neg_o = device_negative_entities_split(
                    triples, negative_rate, n_entities, shard_rng)
                return model.loss_structured(
                    p, graph, triples, mask, neg_s, neg_o, rng=rng,
                    deterministic=False, axis_name=EDGE_AXIS)
            if negative_mode == "binomial":
                if factorizable:
                    # Same per-slot coin-flip objective, computed through
                    # the factored formulation (2x less decoder traffic).
                    values, co = device_negative_parts(
                        triples, negative_rate, n_entities, shard_rng)
                    return model.loss_binomial_factored(
                        p, graph, triples, mask, values, co, rng=rng,
                        deterministic=False, axis_name=EDGE_AXIS)
                t, y, m = device_negative_sample(
                    triples, mask, negative_rate, n_entities, shard_rng)
                return model.loss(p, graph, t, y, m, rng=rng,
                                  deterministic=False, axis_name=EDGE_AXIS)
            raise ValueError(f"unknown negative_mode {negative_mode!r}")

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # Per-device semantics of the in-body value_and_grad: the loss's
        # internal psum'd reductions transpose back to ANOTHER psum, so
        # each device's grad is (mesh size) x its local-shard contribution
        # of the true global gradient. pmean (not psum) therefore
        # reconstitutes the exact global gradient — verified leaf-exact
        # against the single-chip step in tests/test_staircase2_mesh.py
        # and tests/test_parallel.py (SGD parity, scale-sensitive; Adam's
        # scale-invariance would mask a wrong reduction).
        grads = jax.lax.pmean(grads, EDGE_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda a, u: a + u, params, updates)
        return params, opt_state, loss

    rep = P()
    data = P(EDGE_AXIS)

    def wrapped(params, opt_state, graph, triples, labels, mask, rng):
        graph = _mesh_compatible(graph, mesh.devices.size)
        graph_spec = _graph_specs(graph)
        sharded = shard_map(
            step, mesh=mesh,
            in_specs=(rep, rep, graph_spec, data, data, data, rep),
            out_specs=(rep, rep, rep),
            check_vma=False)
        return sharded(params, opt_state, graph, triples, labels, mask, rng)

    return jax.jit(wrapped, donate_argnums=(0, 1))


def shard_batch(mesh: Mesh, graph: Optional[GraphBatch], triples, labels,
                mask):
    """Place host batch arrays with the step's expected shardings (device
    put once, avoiding implicit transfers per step).

    When the mesh spans processes (multi-host), every process holds the
    same host-global batch and only its local rows are transferred
    (parallel/distributed.py)."""
    if jax.process_count() > 1:
        from .distributed import global_shard_batch
        return global_shard_batch(mesh, graph, triples, labels, mask)
    data_sharding = NamedSharding(mesh, P(EDGE_AXIS))
    rep_graph = None
    if graph is not None:
        graph = _mesh_compatible(graph, mesh.devices.size)
        rep_graph = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, data_sharding), graph)
    return (rep_graph,
            jax.device_put(triples, data_sharding),
            jax.device_put(labels, data_sharding),
            jax.device_put(mask, data_sharding))


def replicate(mesh: Mesh, tree):
    """Fully-replicated placement of a parameter/optimizer pytree.

    Copies through host numpy so the result NEVER aliases the input: when
    the requested sharding matches an array's current placement,
    jax.device_put returns the same buffer, and donating that buffer to a
    train step would silently delete the caller's copy.
    """
    if jax.process_count() > 1:
        from .distributed import fetch_replicated, global_replicate
        return global_replicate(mesh, fetch_replicated(tree))
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), sharding), tree)
