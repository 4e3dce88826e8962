"""Vertex-sharded encoder: exact parity with the single-chip encode,
targeted halo exchange, block-variant support, and the sharded train step."""
import dataclasses

import jax
import numpy as np
import optax
import pytest

from relationprediction_tpu import config as config_lib
from relationprediction_tpu.models import build_model
from relationprediction_tpu.parallel import make_mesh
from relationprediction_tpu.parallel.vertex_sharded import (
    VertexShardedEncoder, build_halo, halo_traffic_rows,
    partition_edges_by_destination)
from relationprediction_tpu.sampling import NegativeSampler


def setup(toy_dataset, block=False):
    ds = toy_dataset
    cfg = config_lib.load("/root/reference/settings/gcn_basis.exp")
    enc_kw = dict(code_dimension=16, internal_dimension=16, n_bases=4)
    if block:
        enc_kw.update(concatenation=True)  # 4 blocks of 4x4
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, **enc_kw),
        decoder=dataclasses.replace(cfg.decoder, code_dimension=16))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    return ds, build_model(cfg)


def test_partitioning_covers_all_edges(toy_dataset, rng):
    ds, model = setup(toy_dataset)
    f, b, rows_per = partition_edges_by_destination(
        ds.train, ds.n_entities, 4, pad_to=64, n_relations=ds.n_relations)
    f_sen, f_rel, f_rec, f_msk, f_nrm = f
    assert f_msk.sum() == len(ds.train)
    # every real edge's receiver belongs to its shard
    for s in range(4):
        m = f_msk[s] > 0
        assert np.all(f_rec[s][m] // rows_per == s)
        # receiver-sorted within shard
        assert np.all(np.diff(f_rec[s][m]) >= 0)


def test_build_halo_pointers_resolve_to_requested_rows(toy_dataset):
    ds, _ = setup(toy_dataset)
    rows_per, n_shards = 4, 4
    rng = np.random.default_rng(0)
    src = rng.integers(0, ds.n_entities, (n_shards, 24)).astype(np.int32)
    msk = (rng.random((n_shards, 24)) > 0.2).astype(np.float32)
    layout, ptr = build_halo(src, msk, rows_per, n_shards, ds.n_entities)
    # simulate the exchange with a feature table = global vertex id;
    # buffer layout = N remote slabs of H rows, then the local slab
    feats = np.arange(rows_per * n_shards, dtype=np.float32)
    halo = np.zeros((n_shards, n_shards * layout.h + rows_per), np.float32)
    for d in range(n_shards):
        for q in range(n_shards):
            rows = layout.send_idx[q, d]
            halo[d, q * layout.h:(q + 1) * layout.h] = \
                feats[q * rows_per + rows]
        halo[d, n_shards * layout.h:] = \
            feats[d * rows_per:(d + 1) * rows_per]
    for d in range(n_shards):
        got = halo[d][ptr[d]]
        want = src[d].astype(np.float32)
        live = msk[d] > 0
        np.testing.assert_array_equal(got[live], want[live])


@pytest.mark.parametrize("block", [False, True])
@pytest.mark.parametrize("halo", ["targeted", "all_gather"])
def test_vertex_sharded_matches_single_chip(toy_dataset, block, halo):
    ds, model = setup(toy_dataset, block=block)
    mesh = make_mesh(4)
    vs = VertexShardedEncoder(model, mesh, halo=halo)
    params = model.init_params(jax.random.PRNGKey(0))

    f, b = vs.prepare(ds.train, pad_to=64)
    padded = vs.pad_params(params)
    encode = vs.encode_fn()
    sharded_codes = np.asarray(encode(padded, f, b))[:ds.n_entities]

    graph = model.make_graph(ds.train, pad_to=64)
    want = np.asarray(model.encode(params, graph,
                                   deterministic=True).entity_codes)
    np.testing.assert_allclose(sharded_codes, want, rtol=2e-4, atol=2e-5)


def test_vertex_sharded_loss_and_grads_match_single_chip(toy_dataset):
    ds, model = setup(toy_dataset, block=True)
    mesh = make_mesh(4)
    # full_parity reproduces the single-chip dropout RNG stream exactly
    # (the per_shard default draws per-shard streams — same distribution,
    # different bits).
    vs = VertexShardedEncoder(model, mesh, dropout_mode="full_parity")
    params = model.init_params(jax.random.PRNGKey(0))
    f, b = vs.prepare(ds.train, pad_to=64)
    padded = vs.pad_params(params)

    ns = NegativeSampler(2, ds.n_entities, np.random.default_rng(0))
    x, y = ns.transform(ds.train)
    xt, yt, mt, dec_send, e1p, e2p = vs.prepare_batch(x, y)
    rng = jax.random.PRNGKey(7)

    loss_fn = vs.loss_fn()
    loss_sharded, grads_sharded = jax.value_and_grad(loss_fn)(
        padded, f, b, xt, yt, mt, dec_send, e1p, e2p, rng)

    # single-chip reference loss on the identical batch + rng
    graph = model.make_graph(ds.train, pad_to=64)
    t_pad = xt.reshape(-1, 3)
    y_pad = yt.reshape(-1)
    m_pad = mt.reshape(-1)
    want, grads_want = jax.value_and_grad(
        lambda p: model.loss(p, graph, t_pad, y_pad, m_pad, rng=rng,
                             deterministic=False))(params)

    np.testing.assert_allclose(float(loss_sharded), float(want),
                               rtol=2e-4, atol=2e-5)
    # entity-table gradient: sharded rows == single-chip rows
    gw = np.asarray(grads_sharded["input_transform"]["W"])[:ds.n_entities]
    np.testing.assert_allclose(
        gw, np.asarray(grads_want["input_transform"]["W"]),
        rtol=5e-4, atol=1e-5)
    # a replicated leaf too (relation embeddings)
    np.testing.assert_allclose(
        np.asarray(grads_sharded["relation_embedding"]["W_relation"]),
        np.asarray(grads_want["relation_embedding"]["W_relation"]),
        rtol=5e-4, atol=1e-5)


def test_vertex_sharded_train_step_learns(toy_dataset):
    ds, model = setup(toy_dataset)
    mesh = make_mesh(4)
    vs = VertexShardedEncoder(model, mesh)
    params = vs.pad_params(model.init_params(jax.random.PRNGKey(0)))
    f, b = vs.prepare(ds.train, pad_to=64)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    step = vs.make_train_step(opt)

    ns = NegativeSampler(2, ds.n_entities, np.random.default_rng(0))
    losses = []
    for i in range(12):
        x, y = ns.transform(ds.train)
        batch = vs.prepare_batch(x, y)
        params, opt_state, loss = step(params, opt_state, f, b, *batch,
                                       jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8


def test_targeted_halo_ships_fewer_rows_than_all_gather():
    # community-structured graph: edges stay within vertex blocks, so each
    # shard's boundary is far smaller than the full table
    n_shards, rows_per = 4, 32
    V = n_shards * rows_per
    rng = np.random.default_rng(0)
    edges = []
    for c in range(n_shards):
        lo = c * rows_per
        s = rng.integers(lo, lo + rows_per, 200)
        o = rng.integers(lo, lo + rows_per, 200)
        edges.append(np.stack([s, np.zeros(200, int), o], 1))
    triples = np.concatenate(edges).astype(np.int32)
    f, b, _ = partition_edges_by_destination(triples, V, n_shards,
                                             pad_to=256, n_relations=1)
    layout, _ = build_halo(f[0], f[3], rows_per, n_shards, V)
    targeted, allgather = halo_traffic_rows(layout, rows_per, n_shards)
    assert targeted < allgather / 2


@pytest.mark.parametrize("block", [False, True])
def test_overlapped_halo_matches_sequential(toy_dataset, block):
    """overlap=True (local-source messages computed while the boundary
    exchange is in flight) must be numerically identical to the
    sequential schedule — encode AND loss+grads."""
    ds, model = setup(toy_dataset, block=block)
    mesh = make_mesh(4)
    params = model.init_params(jax.random.PRNGKey(0))
    ns = NegativeSampler(2, ds.n_entities, np.random.default_rng(0))
    x, y = ns.transform(ds.train)
    rng = jax.random.PRNGKey(7)

    results = []
    for overlap in (False, True):
        vs = VertexShardedEncoder(model, mesh, overlap=overlap,
                                  dropout_mode="full_parity")
        f, b = vs.prepare(ds.train, pad_to=64)
        padded = vs.pad_params(params)
        codes = np.asarray(vs.encode_fn()(padded, f, b))
        batch = vs.prepare_batch(x, y)
        loss, grads = jax.value_and_grad(vs.loss_fn())(
            padded, f, b, *batch, rng)
        results.append((codes, float(loss), grads))
    np.testing.assert_allclose(results[0][0], results[1][0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(results[0][1], results[1][1],
                               rtol=1e-5, atol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(results[0][2]),
                     jax.tree_util.tree_leaves(results[1][2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-6)


def test_halo_budget_static_and_overflow(toy_dataset):
    ds, model = setup(toy_dataset)
    mesh = make_mesh(4)
    vs = VertexShardedEncoder(model, mesh)
    # generous budget: layouts padded to exactly the budget
    f, b = vs.prepare(ds.train, pad_to=64, halo_budget=16)
    assert f[5].shape[-1] == 16 and b[5].shape[-1] == 16
    # impossible budget: loud error, not a recompile
    with pytest.raises(ValueError, match="halo budget"):
        vs.prepare(ds.train, pad_to=64, halo_budget=0)


def test_trainloop_vertex_sharded_one_compile_and_parity(toy_dataset):
    """The integrated engine path: 5 steps over 5 RESAMPLED subgraphs
    compile the step exactly once (static probed budgets), and the loss
    stream matches the single-chip TrainLoop on identical batches."""
    import dataclasses as dc

    from relationprediction_tpu.training import TrainLoop

    ds = toy_dataset
    cfg = config_lib.load("/root/reference/settings/gcn_basis.exp")
    cfg = dc.replace(
        cfg,
        encoder=dc.replace(cfg.encoder, code_dimension=16,
                           internal_dimension=16, n_bases=4),
        decoder=dc.replace(cfg.decoder, code_dimension=16),
        training=dc.replace(cfg.training, graph_batch_size=32))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))

    losses = {}

    def run(tag, **kw):
        model = build_model(cfg)
        seen = []

        def log(msg):
            if msg.startswith("Initial loss:"):
                seen.append(float(msg.split(":")[1]))

        loop = TrainLoop(model, cfg, ds, seed=7, prefetch=False,
                         steps_per_dispatch=1, log=log,
                         device_negatives=False, **kw)
        res = loop.fit(max_iterations=5)
        losses[tag] = seen
        return loop, res

    loop_vs, res_vs = run("vs", mesh=make_mesh(4), vertex_sharded=True,
                          vs_dropout_mode="full_parity")
    assert loop_vs._train_step._cache_size() == 1, \
        "resampled subgraphs must share ONE compiled step"
    _, res_single = run("single")

    assert losses["vs"][0] == pytest.approx(losses["single"][0], rel=5e-4)
    assert res_vs.last_loss == pytest.approx(res_single.last_loss,
                                             rel=5e-4)
    # final entity table parity (unpad the sharded copy)
    w_vs = loop_vs.vse.unpad_params(res_vs.params)
    w_vs = w_vs["input_transform"]["W"]
    w_single = np.asarray(res_single.params["input_transform"]["W"])
    np.testing.assert_allclose(w_vs, w_single, rtol=5e-3, atol=5e-5)


def test_trainloop_vertex_sharded_per_shard_dropout_learns(toy_dataset):
    """The scalable per-shard dropout default trains (distribution is the
    same even though the mask stream differs from single-chip)."""
    import dataclasses as dc

    from relationprediction_tpu.training import TrainLoop

    ds = toy_dataset
    cfg = config_lib.load("/root/reference/settings/gcn_basis.exp")
    cfg = dc.replace(
        cfg,
        encoder=dc.replace(cfg.encoder, code_dimension=16,
                           internal_dimension=16, n_bases=4),
        decoder=dc.replace(cfg.decoder, code_dimension=16))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    model = build_model(cfg)
    loop = TrainLoop(model, cfg, ds, seed=0, prefetch=False,
                     log=lambda m: None, mesh=make_mesh(4),
                     vertex_sharded=True)
    first = loop.fit(max_iterations=1)
    more = loop.fit(params=first.params, opt_state=first.opt_state,
                    max_iterations=12, start_iteration=1)
    assert np.isfinite(more.last_loss)
    assert more.last_loss < first.last_loss


def test_vertex_sharded_eval_view_matches_single_chip(toy_dataset):
    """VertexShardedModelView: all-entity scoring against the row-sharded
    code table reproduces the single-chip scores."""
    from relationprediction_tpu.parallel.vertex_sharded import (
        VertexShardedModelView)

    ds, model = setup(toy_dataset)
    mesh = make_mesh(4)
    vs = VertexShardedEncoder(model, mesh)
    params = model.init_params(jax.random.PRNGKey(3))
    f, b = vs.prepare(ds.train, pad_to=64)
    view = VertexShardedModelView(vs, f, b, chunk_pad=8)

    graph = model.make_graph(ds.train, pad_to=64)
    for fn_view, fn_model in (
            (view.score_all_subjects, model.score_all_subjects),
            (view.score_all_objects, model.score_all_objects)):
        got = fn_view(params, None, ds.test, apply_sigmoid=False)
        want = np.asarray(fn_model(params, graph, ds.test,
                                   apply_sigmoid=False))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    got = view.score(params, None, ds.test)
    want = np.asarray(model.score(params, graph, ds.test))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_vertex_sharded_rejects_unsupported(toy_dataset):
    ds, model = setup(toy_dataset)
    cfg = dataclasses.replace(
        model.config,
        encoder=dataclasses.replace(model.config.encoder,
                                    skip_connections="Highway"))
    with pytest.raises(ValueError):
        VertexShardedEncoder(build_model(cfg), make_mesh(4))
    with pytest.raises(ValueError):
        VertexShardedEncoder(model, make_mesh(4), halo="bogus")


def test_vertex_sharded_block_uses_fused_kernel(toy_dataset, monkeypatch):
    """The default block-variant VS encode must trace the fused
    staircase-v2 kernel, not the segment-sum fallback."""
    from relationprediction_tpu.ops import staircase2 as s2lib
    from relationprediction_tpu.parallel import vertex_sharded as vs_mod

    ds, model = setup(toy_dataset, block=True)
    calls = {"n": 0}
    real = s2lib.block_direction

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    # _local_encode imports the module lazily, so patch at the source.
    monkeypatch.setattr(s2lib, "block_direction", counting)

    vs = VertexShardedEncoder(model, make_mesh(4))
    assert vs.fused
    params = model.init_params(jax.random.PRNGKey(0))
    f, b = vs.prepare(ds.train, pad_to=64)
    codes = vs.encode_fn()(vs.pad_params(params), f, b)
    assert np.isfinite(np.asarray(codes)).all()
    # 2 layers x 2 directions minimum on the forward trace.
    assert calls["n"] >= 4, f"fused kernel not traced ({calls['n']})"


def test_vertex_sharded_fused_multiblock_parity(rng):
    """Fused VS parity at a scale where each shard spans multiple
    row-blocks (rb=256 < rows_per) and the halo is non-trivial."""
    import dataclasses as dc

    V, R, E = 1200, 7, 1500
    tr = np.stack([rng.integers(0, V, E), rng.integers(0, R, E),
                   rng.integers(0, V, E)], axis=1).astype(np.int32)
    cfg = config_lib.load("/root/reference/settings/gcn_basis.exp")
    cfg = dc.replace(
        cfg,
        encoder=dc.replace(cfg.encoder, code_dimension=16,
                           internal_dimension=16, n_bases=4,
                           concatenation=True, n_layers=1),
        decoder=dc.replace(cfg.decoder, code_dimension=16))
    cfg = cfg.with_counts(V, R, E)
    model = build_model(cfg)
    mesh = make_mesh(4)
    vs = VertexShardedEncoder(model, mesh)
    assert vs.fused and vs.rows_per > 256  # multiple row-blocks/shard
    params = model.init_params(jax.random.PRNGKey(0))
    f, b = vs.prepare(tr, pad_to=1536)
    got = np.asarray(vs.encode_fn()(vs.pad_params(params), f, b))[:V]
    graph = model.make_graph(tr, pad_to=1536)
    want = np.asarray(model.encode(params, graph,
                                   deterministic=True).entity_codes)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_vertex_sharded_factored_binomial_matches_single_chip(toy_dataset):
    """The VS factored-binomial loss (corruption-in-halo) equals the
    single-chip factored loss on identical positives + corruption
    draws, including gradients through the sharded entity table."""
    ds, model = setup(toy_dataset, block=True)
    mesh = make_mesh(4)
    vs = VertexShardedEncoder(model, mesh, dropout_mode="full_parity")
    params = model.init_params(jax.random.PRNGKey(0))
    f, b = vs.prepare(ds.train, pad_to=64)
    padded = vs.pad_params(params)

    rngnp = np.random.default_rng(0)
    pos = np.asarray(ds.train, dtype=np.int32)
    k = 3
    vals = rngnp.integers(0, ds.n_entities, (len(pos), k)).astype(np.int32)
    co = rngnp.random((len(pos), k)) < 0.5
    (xt, mt, vt, ct, dec_send, e1p, e2p,
     evp) = vs.prepare_batch_factored(pos, vals, co)
    rng = jax.random.PRNGKey(7)

    loss_fn = vs.loss_fn_factored()
    loss_sharded, grads_sharded = jax.value_and_grad(loss_fn)(
        padded, f, b, xt, mt, vt, ct, dec_send, e1p, e2p, evp, rng)

    graph = model.make_graph(ds.train, pad_to=64)
    t_pad = xt.reshape(-1, 3)
    m_pad = mt.reshape(-1)
    v_pad = vt.reshape(-1, k)
    c_pad = ct.reshape(-1, k)
    want, grads_want = jax.value_and_grad(
        lambda p: model.loss_binomial_factored(
            p, graph, t_pad, m_pad, v_pad, c_pad, rng=rng,
            deterministic=False))(params)

    np.testing.assert_allclose(float(loss_sharded), float(want),
                               rtol=2e-4, atol=2e-5)
    gw = np.asarray(grads_sharded["input_transform"]["W"])[:ds.n_entities]
    np.testing.assert_allclose(
        gw, np.asarray(grads_want["input_transform"]["W"]),
        rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grads_sharded["decoder"]["W_relation"])
        if "W_relation" in grads_sharded.get("decoder", {}) else
        np.asarray(grads_sharded["relation_embedding"]["W_relation"]),
        np.asarray(grads_want["relation_embedding"]["W_relation"]),
        rtol=5e-4, atol=1e-5)


def test_trainloop_vertex_sharded_factored_learns(toy_dataset):
    """TrainLoop with vertex_sharded + binomial now runs the factored
    objective end to end (the round-4 exclusion is lifted) and learns."""
    from relationprediction_tpu.training import TrainLoop

    ds, model = setup(toy_dataset, block=True)
    import dataclasses as dc
    cfg = dc.replace(
        model.config,
        optimizer=dc.replace(model.config.optimizer,
                             learning_rate=0.05))
    model = build_model(cfg)
    mesh = make_mesh(4)
    loop = TrainLoop(model, cfg, ds, seed=0, mesh=mesh,
                     vertex_sharded=True, prefetch=False,
                     log=lambda s: None)
    assert loop._vs_factored
    first = loop.fit(max_iterations=1)
    more = loop.fit(params=first.params, opt_state=first.opt_state,
                    max_iterations=25, start_iteration=1)
    assert np.isfinite(more.last_loss)
    assert more.last_loss < first.last_loss
