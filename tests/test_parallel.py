"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""
import dataclasses

import jax
import numpy as np
import pytest

from relationprediction_tpu import config as config_lib
from relationprediction_tpu.graph import build_graph_batch
from relationprediction_tpu.models import build_model
from relationprediction_tpu.parallel import (make_mesh,
                                             make_sharded_train_step,
                                             replicate, shard_batch)
from relationprediction_tpu.training import BatchPipeline
from relationprediction_tpu.training.optimizers import build_optimizer


def make_setup(toy_dataset, exp="gcn_basis"):
    ds = toy_dataset
    cfg = config_lib.load(f"/root/reference/settings/{exp}.exp")
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, code_dimension=16,
                                    internal_dimension=16, n_bases=4),
        decoder=dataclasses.replace(cfg.decoder, code_dimension=16))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    graph = build_graph_batch(ds.train, ds.n_entities, ds.n_relations,
                              pad_to=64)
    rng = np.random.default_rng(0)
    n = len(ds.train) * 11
    pipeline = BatchPipeline(model, cfg, ds, rng)
    batch = pipeline.next()
    return cfg, model, params, graph, batch


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.parametrize("exp", ["gcn_basis", "gcn_block"])
def test_sharded_loss_matches_single_chip(toy_dataset, exp):
    """The edge-sharded step must produce the exact same loss and update as
    the single-device step (parallelism is an implementation detail)."""
    cfg, model, params, graph, batch = make_setup(toy_dataset, exp)
    opt = build_optimizer(cfg.optimizer)
    mesh = make_mesh()

    # Single-chip reference step.
    def single_step(p, s, graph, t, y, m, rng):
        def loss_fn(p):
            return model.loss(p, graph, t, y, m, rng=rng,
                              deterministic=False)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s, p)
        p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
        return p, s, loss

    rng = jax.random.PRNGKey(7)
    opt_state = opt.init(params)
    p1, s1, loss1 = jax.jit(single_step)(params, opt_state, batch.graph,
                                         batch.triples, batch.labels,
                                         batch.mask, rng)

    step = make_sharded_train_step(model, opt, mesh)
    params_r = replicate(mesh, params)
    opt_state_r = replicate(mesh, opt.init(params))
    g, t, y, m = shard_batch(mesh, batch.graph, batch.triples, batch.labels,
                             batch.mask)
    p2, s2, loss2 = step(params_r, opt_state_r, g, t, y, m, rng)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)


def test_sharded_step_runs_multiple_iterations(toy_dataset):
    cfg, model, params, graph, batch = make_setup(toy_dataset)
    opt = build_optimizer(cfg.optimizer)
    mesh = make_mesh()
    step = make_sharded_train_step(model, opt, mesh)
    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt.init(params))
    g, t, y, m = shard_batch(mesh, batch.graph, batch.triples, batch.labels,
                             batch.mask)
    losses = []
    for i in range(5):
        params, opt_state, loss = step(params, opt_state, g, t, y, m,
                                       jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_sharded_embedding_model(toy_dataset):
    """Non-graph (embedding) models shard only the triple batch."""
    cfg, model, params, _, batch = make_setup(toy_dataset, "distmult")
    opt = build_optimizer(cfg.optimizer)
    mesh = make_mesh()
    step = make_sharded_train_step(model, opt, mesh, has_graph=False)
    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt.init(params))
    _, t, y, m = shard_batch(mesh, None, batch.triples, batch.labels,
                             batch.mask)
    p, s, loss = step(params, opt_state, None, t, y, m, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_sharded_staircase_parity(toy_dataset):
    """A staircase layout built with sc_shards == mesh size runs the Pallas
    aggregation inside shard_map and must match the single-chip loss."""
    cfg, model, params, _, _ = make_setup(toy_dataset, "gcn_basis")
    ds = toy_dataset
    mesh = make_mesh()
    n = mesh.devices.size
    pad = model.graph_pad_bound(len(ds.train))
    pad = -(-pad // n) * n
    # Request the v1 layouts explicitly: block/basis models now default to
    # the fused v2 layouts (tests/test_staircase2_mesh.py), but v1 remains
    # the sharded path for the variants v2 does not cover.
    g_single = model.make_graph(ds.train, pad_to=pad, staircase=True,
                                staircase2=False)
    g_sharded = model.make_graph(ds.train, pad_to=pad, sc_shards=n,
                                 staircase=True, staircase2=False)
    assert g_sharded.sc_fwd is not None
    assert g_sharded.sc_fwd.shards == n

    rng = np.random.default_rng(3)
    t = rng.integers(0, ds.n_entities, (n * 16, 3)).astype(np.int32)
    t[:, 1] = rng.integers(0, ds.n_relations, n * 16)
    y = (rng.random(n * 16) < 0.5).astype(np.float32)
    m = np.ones(n * 16, np.float32)

    key = jax.random.PRNGKey(0)
    loss1 = float(jax.jit(
        lambda p: model.loss(p, g_single, t, y, m, rng=key,
                             deterministic=True))(params))

    opt = build_optimizer(cfg.optimizer)
    step = make_sharded_train_step(model, opt, mesh)
    params_r = replicate(mesh, params)
    opt_r = replicate(mesh, opt.init(params))
    g, ts, ys, ms = shard_batch(mesh, g_sharded, t, y, m)
    # Confirm the layouts were kept (not dropped by _mesh_compatible).
    assert g.sc_fwd is not None
    _, _, loss2 = step(params_r, opt_r, g, ts, ys, ms, key)
    # deterministic=False in the sharded step -> compare losses loosely via
    # a deterministic re-evaluation instead:
    loss3 = float(jax.jit(
        lambda p: model.loss(p, g_sharded, t, y, m, rng=key,
                             deterministic=True))(params))
    np.testing.assert_allclose(loss1, loss3, rtol=2e-5)
    assert np.isfinite(float(loss2))


# ---------------------------------------------------------------------------
# Integrated engine: TrainLoop(mesh=...) end-to-end
# ---------------------------------------------------------------------------

def _small_cfg(toy_dataset, exp="gcn_basis", **opt_overrides):
    ds = toy_dataset
    cfg = config_lib.load(f"/root/reference/settings/{exp}.exp")
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, code_dimension=16,
                                    internal_dimension=16, n_bases=4),
        decoder=dataclasses.replace(cfg.decoder, code_dimension=16),
        optimizer=dataclasses.replace(cfg.optimizer, **opt_overrides))
    return cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))


def test_trainloop_fit_on_mesh_loss_parity(toy_dataset):
    """TrainLoop.fit over the 8-device mesh must track the single-device
    run: same host-sampled batches (device_negatives=False), so per-step
    losses and final params agree up to reduction-order float noise."""
    from relationprediction_tpu.training import TrainLoop

    losses = {"single": [], "mesh": []}

    def run(mesh, tag):
        cfg = _small_cfg(toy_dataset)
        model = build_model(cfg)

        def log(msg):
            if msg.startswith("Initial loss:"):
                losses[tag].append(float(msg.split(":")[1]))

        loop = TrainLoop(model, cfg, toy_dataset, seed=7, prefetch=False,
                         device_negatives=False, steps_per_dispatch=1,
                         log=log, mesh=mesh)
        return loop.fit(max_iterations=4)

    r1 = run(None, "single")
    r2 = run(make_mesh(), "mesh")
    np.testing.assert_allclose(r1.last_loss, r2.last_loss,
                               rtol=5e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(r1.params),
                    jax.tree_util.tree_leaves(r2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)


def test_trainloop_mesh_device_negatives_learns(toy_dataset):
    """The mesh loop's on-device per-shard negative corruption must train
    (losses finite and decreasing on Toy)."""
    from relationprediction_tpu.training import TrainLoop

    cfg = _small_cfg(toy_dataset)
    model = build_model(cfg)
    loop = TrainLoop(model, cfg, toy_dataset, seed=0, prefetch=False,
                     log=lambda m: None, mesh=make_mesh())
    first = loop.fit(max_iterations=1)
    more = loop.fit(params=first.params, opt_state=first.opt_state,
                    max_iterations=12, start_iteration=1)
    assert np.isfinite(more.last_loss)
    assert more.last_loss < first.last_loss


def test_trainloop_mesh_invokes_sharded_step(toy_dataset, monkeypatch):
    """Regression (round-2 advisor, engine.py): fit() must route EVERY mesh
    step through the shard_map'd executable. The old guard
    ``k < steps_per_dispatch`` never fired for mesh runs (steps_per_dispatch
    is forced to 1), so the plain scan path ran the whole step replicated."""
    from relationprediction_tpu.parallel import mesh as mesh_mod
    from relationprediction_tpu.training import TrainLoop

    calls = []
    orig = mesh_mod.shard_batch

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(mesh_mod, "shard_batch", spy)
    cfg = _small_cfg(toy_dataset)
    model = build_model(cfg)
    loop = TrainLoop(model, cfg, toy_dataset, seed=0, prefetch=False,
                     log=lambda m: None, mesh=make_mesh())
    loop.fit(max_iterations=3)
    assert len(calls) == 3


def test_sharded_eval_matches_single_chip(toy_dataset):
    """JittedModelView(mesh=...): edge-sharded encode + triple-sharded
    all-entity scoring must reproduce the single-chip scores and MRR."""
    from relationprediction_tpu.evaluation import Scorer
    from relationprediction_tpu.models.build import JittedModelView

    ds = toy_dataset
    cfg = _small_cfg(toy_dataset)
    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(1))
    mesh = make_mesh()
    n = mesh.devices.size
    pad = -(-model.graph_pad_bound(len(ds.train)) // (128 * n)) * (128 * n)
    graph = model.make_graph(ds.train, pad_to=pad, sc_shards=n)

    view1 = JittedModelView(model)
    view8 = JittedModelView(model, mesh=mesh)
    t = np.asarray(ds.valid, dtype=np.int32)

    s1 = np.asarray(view1.score_all_objects(params, graph, t,
                                            apply_sigmoid=False))
    s8 = np.asarray(view8.score_all_objects(params, graph, t,
                                            apply_sigmoid=False))
    assert s8.shape == s1.shape
    np.testing.assert_allclose(s1, s8, rtol=2e-4, atol=2e-5)

    def mrr(view):
        sc = Scorer(metric="MRR", chunk_size=7)  # ragged chunks vs 8 devices
        sc.register_data(ds.train)
        sc.register_data(ds.valid)
        sc.register_data(ds.test)
        sc.register_degrees(ds.train)
        sc.register_model(view, params, graph, n_entities=ds.n_entities)
        sc.finalize_frequency_computation(ds.all_triples())
        return sc.compute_scores(ds.valid).results["Filtered"]["MRR"]

    np.testing.assert_allclose(mrr(view1), mrr(view8), rtol=1e-5)


def test_trainloop_mesh_with_sharded_eval(toy_dataset):
    """Full integration: mesh training loop driving sharded validation
    scoring (replicated params flow straight into the sharded scorer)."""
    from relationprediction_tpu.evaluation import Scorer
    from relationprediction_tpu.models.build import JittedModelView
    from relationprediction_tpu.training import TrainLoop

    ds = toy_dataset
    cfg = _small_cfg(toy_dataset, early_stopping_check_every=4)
    model = build_model(cfg)
    mesh = make_mesh()
    n = mesh.devices.size
    pad = -(-model.graph_pad_bound(len(ds.train)) // (128 * n)) * (128 * n)
    eval_graph = model.make_graph(ds.train, pad_to=pad, sc_shards=n)

    view = JittedModelView(model, mesh=mesh)
    scorer = Scorer(metric="MRR")
    scorer.register_data(ds.train)
    scorer.register_data(ds.valid)
    scorer.register_data(ds.test)
    scorer.register_degrees(ds.train)
    scorer.register_model(view, None, eval_graph, n_entities=ds.n_entities)
    scorer.finalize_frequency_computation(ds.all_triples())

    scores = []

    def score_fn(params):
        scorer.set_params(params)
        s = scorer.compute_scores(ds.valid).results["Filtered"]["MRR"]
        scores.append(s)
        return s

    loop = TrainLoop(model, cfg, ds, scoring_function=score_fn, seed=0,
                     prefetch=False, log=lambda m: None, mesh=mesh)
    result = loop.fit(max_iterations=8)
    assert len(scores) == 2
    assert all(0.0 < s <= 1.0 for s in scores)
    assert np.isfinite(result.last_loss)
