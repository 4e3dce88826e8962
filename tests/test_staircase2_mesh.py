"""Fused staircase-v2 kernel under an edge-partitioned device mesh.

The production kernel must COMPOSE with multi-chip execution: shard-local
layouts (graph.py sc_shards) + per-device fused passes + one psum must
reproduce the single-chip sc2 aggregation exactly (CPU f32), for both the
block and basis variants, encode and loss+grads.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relationprediction_tpu import config as config_lib
from relationprediction_tpu.models import build_model, encoders
from relationprediction_tpu.parallel import make_mesh
from relationprediction_tpu.parallel.mesh import (EDGE_AXIS, _graph_specs,
                                                  _mesh_compatible,
                                                  make_sharded_train_step,
                                                  replicate, shard_batch)
from relationprediction_tpu.training.optimizers import build_optimizer

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

V, R, DIM = 50, 6, 16
N_DEV = 8


def model_for(variant):
    enc = config_lib.EncoderConfig(
        name="gcn_basis", n_layers=2, code_dimension=DIM,
        internal_dimension=DIM, n_bases=4, use_input_transform=True,
        concatenation=(variant == "block"))
    cfg = config_lib.RunConfig(
        encoder=enc,
        decoder=config_lib.DecoderConfig(name="bilinear-diag",
                                         code_dimension=DIM),
    ).with_counts(V, R, 0)
    return build_model(cfg), cfg


def random_edges(rng, n):
    return np.stack([rng.integers(0, V, n), rng.integers(0, R, n),
                     rng.integers(0, V, n)], axis=1).astype(np.int32)


@pytest.mark.parametrize("variant", ["block", "basis"])
def test_sc2_mesh_encode_parity(rng, variant):
    """Sharded sc2 encode == single-chip sc2 encode, exactly."""
    model, _ = model_for(variant)
    assert model.preferred_staircase2
    edges = random_edges(rng, 300)
    pad = 128 * N_DEV

    g_single = model.make_graph(edges, pad_to=pad)
    g_mesh = model.make_graph(edges, pad_to=pad, shard_align=N_DEV,
                              sc_shards=N_DEV)
    assert g_single.sc2_fwd is not None
    assert g_mesh.sc2_fwd is not None
    assert g_mesh.sc2_fwd.fwd.shards == N_DEV
    # The mesh does NOT drop the shard-local layouts...
    assert _mesh_compatible(g_mesh, N_DEV).sc2_fwd is not None
    # ...but does drop mismatched ones.
    assert _mesh_compatible(g_single, N_DEV).sc2_fwd is None

    params = model.init_params(jax.random.PRNGKey(0))
    want = model.encode(params, g_single, deterministic=True)

    mesh = make_mesh(N_DEV)

    def enc_sharded(p, g):
        return model.encode(p, g, deterministic=True,
                            axis_name=EDGE_AXIS)

    got = jax.jit(shard_map(
        enc_sharded, mesh=mesh, in_specs=(jax.sharding.PartitionSpec(),
                                          _graph_specs(g_mesh)),
        out_specs=jax.sharding.PartitionSpec(),
        check_vma=False))(params, g_mesh)

    np.testing.assert_allclose(np.asarray(got.entity_codes),
                               np.asarray(want.entity_codes),
                               rtol=1e-5, atol=1e-6)


def test_sc2_mesh_uses_fused_kernel(rng, monkeypatch):
    """The mesh step must actually trace through the fused sc2 op (not
    silently fall back to the segment-sum path)."""
    calls = {"n": 0}
    real = encoders.staircase2_lib.block_direction

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(encoders.staircase2_lib, "block_direction", counting)

    model, cfg = model_for("block")
    edges = random_edges(rng, 300)
    g_mesh = model.make_graph(edges, pad_to=128 * N_DEV, shard_align=N_DEV,
                              sc_shards=N_DEV)
    mesh = make_mesh(N_DEV)
    optimizer = build_optimizer(cfg.optimizer)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    step = make_sharded_train_step(model, optimizer, mesh,
                                   negative_mode="binomial",
                                   negative_rate=3)
    n = 8 * N_DEV
    positives = random_edges(rng, n)
    mask = np.ones(n, np.float32)
    g, t, y, m = shard_batch(mesh, g_mesh, positives,
                             np.zeros(n, np.float32), mask)
    p_rep = replicate(mesh, params)
    o_rep = replicate(mesh, opt_state)
    _, _, loss = step(p_rep, o_rep, g, t, y, m, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # 2 layers x 2 directions, forward trace (VJP re-traces add more).
    assert calls["n"] >= 4, f"fused kernel not traced ({calls['n']} calls)"


def test_real_step_sgd_parity_is_scale_sensitive(rng):
    """End-to-end make_sharded_train_step parity with PLAIN SGD and no
    gradient clipping: a wrong grad reduction (e.g. psum where pmean is
    needed — the round-3 bug, masked by Adam's scale-invariance) scales
    the update by the mesh size and fails this test outright."""
    model, cfg = model_for("block")
    opt_cfg = dataclasses.replace(cfg.optimizer,
                                  algorithm="GradientDescent",
                                  max_gradient_norm=None,
                                  learning_rate=0.1)
    opt = build_optimizer(opt_cfg)
    edges = random_edges(rng, 300)
    pad = 128 * N_DEV
    g_single = model.make_graph(edges, pad_to=pad)
    g_mesh = model.make_graph(edges, pad_to=pad, shard_align=N_DEV,
                              sc_shards=N_DEV)
    n = 16 * N_DEV
    triples = random_edges(rng, n)
    labels = (rng.random(n) < 0.2).astype(np.float32)
    mask = np.ones(n, np.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(3)

    def single_step(p, s, t, y, m):
        loss, grads = jax.value_and_grad(
            lambda q: model.loss(q, g_single, t, y, m, rng=key,
                                 deterministic=False))(p)
        updates, s = opt.update(grads, s, p)
        return jax.tree_util.tree_map(lambda a, u: a + u, p, updates), loss

    p1, loss1 = jax.jit(single_step)(params, opt.init(params), triples,
                                     labels, mask)

    mesh = make_mesh(N_DEV)
    step = make_sharded_train_step(model, opt, mesh)
    g, t, y, m = shard_batch(mesh, g_mesh, triples, labels, mask)
    p2, _, loss2 = step(replicate(mesh, params),
                        replicate(mesh, opt.init(params)), g, t, y, m, key)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=1e-6)


@pytest.mark.parametrize("variant", ["block", "basis"])
def test_sc2_mesh_loss_and_grads_parity(rng, variant):
    """Sharded step objective + grads == single-chip, with pre-tiled
    negatives (negative_mode=None) so both sides see identical batches."""
    model, cfg = model_for(variant)
    edges = random_edges(rng, 300)
    pad = 128 * N_DEV
    g_single = model.make_graph(edges, pad_to=pad)
    g_mesh = model.make_graph(edges, pad_to=pad, shard_align=N_DEV,
                              sc_shards=N_DEV)

    n = 16 * N_DEV
    triples = random_edges(rng, n)
    labels = (rng.random(n) < 0.2).astype(np.float32)
    mask = np.ones(n, np.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(3)

    def single_loss(p):
        return model.loss(p, g_single, triples, labels, mask, rng=key,
                          deterministic=False)

    want, gw = jax.value_and_grad(single_loss)(params)

    mesh = make_mesh(N_DEV)

    # Mirror make_sharded_train_step's structure: value_and_grad INSIDE
    # shard_map, then pmean (each device's grad is mesh_size x its local
    # contribution — the loss's psum'd reductions transpose to a psum).
    def inner(p, g, t, y, m):
        loss, grads = jax.value_and_grad(
            lambda q: model.loss(q, g, t, y, m, rng=key,
                                 deterministic=False,
                                 axis_name=EDGE_AXIS))(p)
        return loss, jax.lax.pmean(grads, EDGE_AXIS)

    P = jax.sharding.PartitionSpec
    got, gg = jax.jit(shard_map(
        inner, mesh=mesh,
        in_specs=(P(), _graph_specs(g_mesh), P(EDGE_AXIS), P(EDGE_AXIS),
                  P(EDGE_AXIS)),
        out_specs=(P(), P()), check_vma=False))(
            params, g_mesh, triples, labels, mask)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    for pw, pg in zip(jax.tree_util.tree_leaves(gw),
                      jax.tree_util.tree_leaves(gg)):
        np.testing.assert_allclose(np.asarray(pg), np.asarray(pw),
                                   rtol=5e-4, atol=1e-6)
