"""End-to-end training-engine tests on the Toy dataset."""
import dataclasses
import os

import numpy as np
import pytest

from relationprediction_tpu import config as config_lib
from relationprediction_tpu.data import dataset as dataset_lib
from relationprediction_tpu.graph import build_graph_batch
from relationprediction_tpu.models import build_model
from relationprediction_tpu.training import TrainLoop, checkpoint


def small_config(exp: str, ds):
    cfg = config_lib.load(f"/root/reference/settings/{exp}.exp")
    enc = dataclasses.replace(cfg.encoder, code_dimension=16,
                              internal_dimension=16,
                              n_bases=min(cfg.encoder.n_bases, 4))
    dec = dataclasses.replace(cfg.decoder, code_dimension=16)
    opt = dataclasses.replace(cfg.optimizer, report_train_loss_every=50,
                              early_stopping_check_every=0)
    cfg = dataclasses.replace(cfg, encoder=enc, decoder=dec, optimizer=opt)
    return cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))


def test_distmult_loss_decreases(toy_dataset):
    cfg = small_config("distmult", toy_dataset)
    model = build_model(cfg)
    loop = TrainLoop(model, cfg, toy_dataset, seed=0, log=lambda s: None,
                     prefetch=False)
    params, opt_state = loop.init_state()
    import jax
    g = None
    first = float(model.loss(params, g,
                             np.asarray(toy_dataset.train),
                             np.ones(len(toy_dataset.train), np.float32),
                             rng=jax.random.PRNGKey(0), deterministic=True))
    result = loop.fit(params, opt_state, max_iterations=60)
    assert result.iterations == 60
    assert np.isfinite(result.last_loss)
    assert result.last_loss < first


def test_gcn_basis_trains(toy_dataset):
    cfg = small_config("gcn_basis", toy_dataset)
    model = build_model(cfg)
    loop = TrainLoop(model, cfg, toy_dataset, seed=0, log=lambda s: None,
                     prefetch=False)
    result = loop.fit(max_iterations=25)
    assert np.isfinite(result.last_loss)
    assert result.iterations == 25


def test_early_stopping_fires(toy_dataset):
    cfg = small_config("distmult", toy_dataset)
    opt = dataclasses.replace(cfg.optimizer, early_stopping_check_every=5,
                              early_stopping_burnin=0)
    cfg = dataclasses.replace(cfg, optimizer=opt)
    model = build_model(cfg)
    scores = iter([0.5, 0.4])  # second check fails the comparator

    loop = TrainLoop(model, cfg, toy_dataset, seed=0,
                     scoring_function=lambda p: next(scores),
                     log=lambda s: None, prefetch=False)
    result = loop.fit(max_iterations=100)
    assert result.stopped_early
    assert result.iterations == 10


def test_early_stopping_burnin_protects(toy_dataset):
    cfg = small_config("distmult", toy_dataset)
    opt = dataclasses.replace(cfg.optimizer, early_stopping_check_every=5,
                              early_stopping_burnin=20)
    cfg = dataclasses.replace(cfg, optimizer=opt)
    model = build_model(cfg)
    scores = iter([0.5, 0.4, 0.3, 0.2, 0.1, 0.05])

    loop = TrainLoop(model, cfg, toy_dataset, seed=0,
                     scoring_function=lambda p: next(scores),
                     log=lambda s: None, prefetch=False)
    result = loop.fit(max_iterations=100)
    # Worsening scores during burn-in (iters 5..20) are ignored; the first
    # check past burnin is iteration 25.
    assert result.stopped_early
    assert result.iterations == 25


def test_checkpoint_save_resume(toy_dataset, tmp_path):
    cfg = small_config("distmult", toy_dataset)
    opt = dataclasses.replace(cfg.optimizer, early_stopping_check_every=0,
                              save_every_n=10)
    cfg = dataclasses.replace(cfg, optimizer=opt)
    model = build_model(cfg)
    path = str(tmp_path / "model")

    loop = TrainLoop(model, cfg, toy_dataset, seed=0, log=lambda s: None,
                     prefetch=False)
    loop.fit(max_iterations=20, checkpoint_path=path)
    assert os.path.exists(path + "-20.ckpt")
    state = checkpoint.restore_latest(path)
    assert state["step"] == 20

    # Resume and continue; deterministic continuation of the same stream.
    loop2 = TrainLoop(model, cfg, toy_dataset, seed=0, log=lambda s: None,
                      prefetch=False)
    result = loop2.resume(path, max_iterations=30)
    assert result.iterations == 30


def test_prefetcher_matches_serial(toy_dataset):
    cfg = small_config("distmult", toy_dataset)
    model = build_model(cfg)
    loop = TrainLoop(model, cfg, toy_dataset, seed=0, log=lambda s: None,
                     prefetch=True)
    result = loop.fit(max_iterations=10)
    assert np.isfinite(result.last_loss)


def test_minibatches_component(toy_dataset):
    cfg = small_config("distmult", toy_dataset)
    opt = dataclasses.replace(cfg.optimizer, batch_size=16)
    cfg = dataclasses.replace(cfg, optimizer=opt)
    model = build_model(cfg)
    # Host-negatives mode: the full tiled batch leaves the pipeline.
    loop = TrainLoop(model, cfg, toy_dataset, seed=0, log=lambda s: None,
                     prefetch=False, device_negatives=False)
    assert loop.pipeline.batch_size == 16
    batch = loop.pipeline.next()
    assert float(np.asarray(batch.mask).sum()) == 16 * 11
    result = loop.fit(max_iterations=5)
    assert np.isfinite(result.last_loss)

    # Device-negatives mode: only the positives leave the pipeline.
    loop2 = TrainLoop(model, cfg, toy_dataset, seed=0, log=lambda s: None,
                      prefetch=False, device_negatives=True)
    batch2 = loop2.pipeline.next()
    assert batch2.triples.shape[0] == 16
    assert float(np.asarray(batch2.mask).sum()) == 16
    result2 = loop2.fit(max_iterations=5)
    assert np.isfinite(result2.last_loss)


def test_contiguous_minibatches(toy_dataset):
    cfg = small_config("distmult", toy_dataset)
    opt = dataclasses.replace(cfg.optimizer, batch_size=16,
                              contiguous_sampling=True)
    cfg = dataclasses.replace(cfg, optimizer=opt)
    model = build_model(cfg)
    loop = TrainLoop(model, cfg, toy_dataset, seed=0, log=lambda s: None,
                     prefetch=False, device_negatives=True)
    train = np.asarray(toy_dataset.train)
    n = len(train)
    # In-order wrapping windows over the training set.
    for start in (0, 16, 32):
        batch = loop.pipeline.next()
        want = train[np.arange(start, start + 16) % n]
        np.testing.assert_array_equal(np.asarray(batch.triples)[:16], want)
    result = loop.fit(max_iterations=5)
    assert np.isfinite(result.last_loss)


def test_resume_bitexact_with_prefetch(toy_dataset, tmp_path):
    """Interrupted-and-resumed training reproduces the uninterrupted run
    bit-exactly, even with multi-threaded prefetch (the deterministic
    round-robin prefetcher + consumption-point pipeline states)."""
    import jax

    cfg = small_config("distmult", toy_dataset)
    opt = dataclasses.replace(cfg.optimizer, save_every_n=10)
    cfg = dataclasses.replace(cfg, optimizer=opt)
    model = build_model(cfg)

    def make_loop():
        return TrainLoop(model, cfg, toy_dataset, seed=0,
                         log=lambda s: None, prefetch=True,
                         prefetch_threads=2)

    res_full = make_loop().fit(max_iterations=20,
                               checkpoint_path=str(tmp_path / "full"))

    make_loop().fit(max_iterations=10, checkpoint_path=str(tmp_path / "half"))
    res_resumed = make_loop().resume(str(tmp_path / "half"),
                                     max_iterations=20)

    assert res_resumed.iterations == 20
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        res_full.params, res_resumed.params)


def test_checkpoint_versioned_format(tmp_path):
    """Checkpoints carry a magic + schema version + checksum; corrupt or
    foreign files fail loudly instead of mis-restoring."""
    import jax
    import pytest

    from relationprediction_tpu.training import checkpoint as ckpt

    path = str(tmp_path / "run")
    fname = ckpt.save(path, params={"w": np.ones(3)}, opt_state={},
                      step=7, rng_key=jax.random.PRNGKey(0))
    state = ckpt.restore_latest(path)
    assert state["step"] == 7
    assert state["schema_version"] == 1
    np.testing.assert_allclose(state["params"]["w"], 1.0)

    # corrupt payload -> checksum failure
    blob = bytearray(open(fname, "rb").read())
    blob[-1] ^= 0xFF
    bad = tmp_path / "bad.ckpt"
    bad.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="checksum"):
        ckpt.restore(str(bad))

    # foreign file -> magic failure
    other = tmp_path / "other.ckpt"
    other.write_bytes(b"not a checkpoint")
    with pytest.raises(ValueError, match="magic"):
        ckpt.restore(str(other))
