"""Training engine: the Converge-equivalent fit loop.

Reproduces the semantics of the reference's decorator-chain optimizer
(``code/optimization/optimize.py`` + ``shared/algorithms.py``) as one
explicit loop:

  * batching: full-train-set batches by default (``abstract.py:108-109``),
    random minibatches when BatchSize is configured
    (``shared/algorithms.py:20-47``);
  * the sample-transform pipeline (``train.py:205-247``'s t_func): degree-
    weighted neighborhood subgraph sampling, 50% message-graph split,
    negative sampling — producing fixed-shape padded device batches;
  * jitted update step: grads + global-norm clip + algorithm update in one
    XLA executable (vs the reference's feed_dict session.run per step);
  * TrainLossReporter: initial loss at iteration 1, windowed average every
    ReportTrainLossEvery (``shared/algorithms.py:82-116``);
  * EarlyStopper: validation scoring every CheckEvery iterations, stop when
    the score stops improving after the burn-in phase
    (``shared/algorithms.py:119-161``);
  * ModelSaver: checkpoint every CheckEvery unless stopping
    (``shared/algorithms.py:61-79``) — extended with full train-state
    resume, which the reference lacks (SURVEY.md §3.5).
"""
from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RunConfig
from ..observability import MetricLogger, StepTimer
from ..data.dataset import KGDataset
from ..graph import GraphBatch
from ..models.build import RGCNModel
from ..sampling import (AdjacencyIndex, NegativeSampler, graph_split,
                        sample_edge_neighborhood_fast, sample_uniform_edges)
from . import checkpoint as ckpt_lib
from .device_sampling import (device_negative_entities_split,
                              device_negative_parts,
                              device_negative_sample)
from .optimizers import build_optimizer


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _next_boundary(i: int, every: Optional[int], offset: int = 0):
    """Smallest j > i with j % every == offset (None if no cadence)."""
    if not every:
        return None
    j = (i - offset) // every * every + offset
    while j <= i:
        j += every
    return j


class TrainBatch(NamedTuple):
    graph: Optional[GraphBatch]
    triples: jax.Array   # [N_pad, 3] int32
    labels: jax.Array    # [N_pad] float32
    mask: jax.Array      # [N_pad] float32
    # Global edge ids of the graph edges (stored-message variant only;
    # padding slots -> edge_count phantom row):
    edge_ids: Optional[jax.Array] = None


class BatchPipeline:
    """Host-side per-iteration batch construction (t_func equivalent,
    ``train.py:205-247``), emitting fixed shapes for single-executable jit.
    """

    def __init__(self, model: RGCNModel, config: RunConfig,
                 dataset: KGDataset, rng: np.random.Generator,
                 sampler: str = "neighborhood",
                 device_negatives: bool = False,
                 shard_multiple: int = 1):
        self.model = model
        self.config = config
        self.train = np.asarray(dataset.train, dtype=np.int32)
        self.rng = rng
        self.sampler = sampler
        # device_negatives: emit only the positive batch (padded) and let
        # the jitted step corrupt on device (training/device_sampling.py).
        self.device_negatives = device_negatives and not model.has_state
        # shard_multiple: every emitted leading dim (loss triples, positive
        # batch, graph edge arrays) is padded to a multiple of this, so the
        # batch can be sharded across a shard_multiple-device mesh
        # (parallel/mesh.py edge partitioning).
        self.shard_multiple = max(1, int(shard_multiple))
        t = config.training
        self.ns = NegativeSampler(t.negative_sample_rate, config.entity_count,
                                  rng)

        n_train = len(self.train)
        align = int(np.lcm(128, self.shard_multiple))
        if model.needs_graph():
            gbs = t.graph_batch_size or n_train
            self.graph_batch_size = min(gbs, n_train)
            self.split_size = int(t.graph_split_size * self.graph_batch_size)
            self.graph_pad = _round_up(
                model.graph_pad_bound(self.split_size,
                                      sharded=self.shard_multiple > 1),
                align)
            self.adj = AdjacencyIndex(self.train, config.entity_count)
            self.n_loss_triples = self.graph_batch_size * (
                t.negative_sample_rate + 1)
        else:
            bs = config.optimizer.batch_size or n_train
            self.batch_size = min(bs, n_train)
            self.n_loss_triples = self.batch_size * (t.negative_sample_rate + 1)
        # Minibatches 'contiguous' mode: in-order wrapping windows instead
        # of random sampling (intent of ``shared/algorithms.py:36-39``).
        self.contiguous = config.optimizer.contiguous_sampling
        self._cursor = 0
        self.triple_pad = max(_round_up(self.n_loss_triples, align), align)

    def next(self) -> TrainBatch:
        cfg = self.config
        edge_ids = None
        if self.model.needs_graph():
            if self.graph_batch_size >= len(self.train):
                batch_ids = np.arange(len(self.train), dtype=np.int32)
            elif self.sampler == "neighborhood":
                batch_ids = sample_edge_neighborhood_fast(
                    self.adj, self.graph_batch_size, self.rng)
            else:
                batch_ids = sample_uniform_edges(
                    len(self.train), self.graph_batch_size, self.rng)
            graph_batch = self.train[batch_ids]
            split_ids = graph_split(batch_ids, cfg.training.graph_split_size,
                                    self.rng)
            graph = self.model.make_graph(
                self.train[split_ids], pad_to=self.graph_pad,
                shard_align=int(np.lcm(8, self.shard_multiple)),
                sc_shards=self.shard_multiple, to_device=False)
            if self.model.has_state:
                # Stored variant: keep the split's global edge ids, padded
                # to the graph's static edge count with the phantom row.
                edge_ids = np.full((graph.n_padded_edges,),
                                   len(self.train), dtype=np.int32)
                edge_ids[:len(split_ids)] = split_ids
            if self.device_negatives:
                return self._positives_batch(graph, graph_batch, edge_ids)
            x, y = self.ns.transform(graph_batch)
        else:
            graph = None
            if getattr(self, "batch_size", None) and \
                    self.batch_size < len(self.train):
                if self.contiguous:
                    idx = (np.arange(self._cursor,
                                     self._cursor + self.batch_size)
                           % len(self.train))
                    self._cursor = int(idx[-1] + 1) % len(self.train)
                else:
                    idx = self.rng.choice(len(self.train),
                                          size=self.batch_size, replace=False)
                batch = self.train[idx]
            else:
                batch = self.train
            if self.device_negatives:
                return self._positives_batch(None, batch, None)
            x, y = self.ns.transform(batch)

        n = len(x)
        xp = np.zeros((self.triple_pad, 3), dtype=np.int32)
        yp = np.zeros((self.triple_pad,), dtype=np.float32)
        mp = np.zeros((self.triple_pad,), dtype=np.float32)
        xp[:n] = x
        yp[:n] = y
        mp[:n] = 1.0
        return TrainBatch(graph, xp, yp, mp, edge_ids=edge_ids)

    # -- resumable host state --------------------------------------------
    def state(self) -> dict:
        """Snapshot of all mutable host state that batch production
        consumes (numpy RNG + contiguous cursor): restoring it reproduces
        the exact future batch stream."""
        return {"rng": self.rng.bit_generator.state, "cursor": self._cursor}

    def set_state(self, st: dict) -> None:
        self.rng.bit_generator.state = st["rng"]
        self._cursor = st["cursor"]

    def _positives_batch(self, graph, positives, edge_ids) -> TrainBatch:
        """positives-only batch for device-side negative sampling: triples
        holds the padded positive edges, labels is unused, mask marks real
        positives."""
        cap = (self.graph_batch_size if self.model.needs_graph()
               else self.batch_size)
        cap = _round_up(cap, int(np.lcm(8, self.shard_multiple)))
        n = len(positives)
        xp = np.zeros((cap, 3), dtype=np.int32)
        mp = np.zeros((cap,), dtype=np.float32)
        xp[:n] = positives
        mp[:n] = 1.0
        return TrainBatch(graph, xp, np.zeros((cap,), np.float32), mp,
                          edge_ids=edge_ids)


class _Prefetcher:
    """Background-thread batch producers so host-side sampling overlaps with
    device steps (the reference's host loop runs serially with the device,
    SURVEY.md §3.3).

    Deterministic by construction: each pipeline feeds its OWN bounded queue
    and ``next()`` consumes round-robin, so the batch stream is a pure
    function of (pipeline seeds, start_offset) regardless of thread timing.
    Each queue item carries the pipeline's post-production host state; the
    state of the most recently consumed item per pipeline (``states()``)
    is exactly what a resumed run must restore to reproduce the stream
    from the next batch onward — this is what makes checkpoint resume
    bit-exact even with multi-threaded prefetch.
    """

    def __init__(self, pipelines, depth: int = 4, start_offset: int = 0,
                 transform=None):
        # transform: applied to each produced batch INSIDE the producer
        # thread (e.g. an async jax.device_put, so host->device transfer
        # overlaps the device's current step instead of serializing with
        # the next dispatch).
        if not isinstance(pipelines, (list, tuple)):
            pipelines = [pipelines]
        self.transform = transform
        self.pipelines = list(pipelines)
        n = len(self.pipelines)
        per_q = max(1, -(-depth // n))
        self.queues = [queue.Queue(maxsize=per_q) for _ in range(n)]
        self.stop_flag = False
        self.error: Optional[BaseException] = None
        self._rr = start_offset % n
        # State to restore per pipeline = state after the last CONSUMED
        # batch (initially: the untouched pipeline state).
        self._consumed_state = [p.state() for p in self.pipelines]
        self.threads = [
            threading.Thread(target=self._run, args=(p, q), daemon=True)
            for p, q in zip(self.pipelines, self.queues)]
        for t in self.threads:
            t.start()

    def _run(self, pipeline, q):
        try:
            while not self.stop_flag:
                batch = pipeline.next()
                if self.transform is not None:
                    batch = self.transform(batch)
                item = (pipeline.state(), batch)
                while not self.stop_flag:
                    try:
                        q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surfaced on next()
            self.error = e

    def next(self) -> TrainBatch:
        q = self.queues[self._rr]
        while True:
            if self.error is not None:
                raise self.error
            try:
                st, batch = q.get(timeout=1.0)
            except queue.Empty:
                continue
            self._consumed_state[self._rr] = st
            self._rr = (self._rr + 1) % len(self.queues)
            return batch

    def states(self):
        """(per-pipeline resume states, next round-robin index)."""
        return list(self._consumed_state), self._rr

    def close(self):
        self.stop_flag = True


@dataclass
class FitResult:
    params: dict
    opt_state: object
    iterations: int
    stopped_early: bool
    last_loss: float
    best_score: Optional[float]


class TrainLoop:
    """fit() driver with loss reporting, early stopping, and checkpointing."""

    def __init__(self, model: RGCNModel, config: RunConfig,
                 dataset: KGDataset, *,
                 scoring_function: Optional[Callable] = None,
                 sampler: str = "neighborhood",
                 seed: int = 0,
                 log: Callable[[str], None] = print,
                 prefetch: bool = True,
                 metrics_path: Optional[str] = None,
                 device_negatives: bool = True,
                 negative_mode: str = "binomial",
                 negative_pool_size: int = 512,
                 steps_per_dispatch: int = 8,
                 prefetch_threads: int = 2,
                 mesh=None,
                 vertex_sharded: bool = False,
                 vs_overlap: bool = False,
                 vs_dropout_mode: str = "per_shard",
                 vs_slack: float = 1.5):
        self.model = model
        self.config = config
        self.dataset = dataset
        self.scoring_function = scoring_function
        self.log = log
        self.prefetch = prefetch
        self.host_rng = np.random.default_rng(seed)
        self.metrics = MetricLogger(metrics_path, echo=False)
        self.timer = StepTimer()
        # mesh: a jax.sharding.Mesh for edge-partitioned multi-chip training
        # (parallel/mesh.py). Batches are padded so every leading dim
        # divides the mesh; the jitted step is the shard_map'd one and
        # params/opt state stay replicated across devices.
        # vertex_sharded: shard the VERTEX axis instead (row-sharded entity
        # table + targeted halo exchange, parallel/vertex_sharded.py) for
        # beyond-HBM entity counts. Uses host-sampled binomial negatives;
        # batches are laid out to static probed budgets so resampled
        # subgraphs share one compiled step.
        self.mesh = mesh
        self.vertex_sharded = vertex_sharded
        if mesh is not None and model.has_state:
            raise ValueError("the stored-message (stateful) variant does not "
                             "support mesh execution")
        shard = int(mesh.devices.size) if mesh is not None else 1
        if vertex_sharded:
            from ..parallel.vertex_sharded import (VertexShardedBatchPipeline,
                                                   VertexShardedEncoder)
            if mesh is None:
                raise ValueError("vertex_sharded requires a mesh")
            if negative_mode != "binomial":
                raise ValueError("vertex_sharded training uses the "
                                 "host-sampled binomial protocol")
            self.vse = VertexShardedEncoder(model, mesh,
                                            overlap=vs_overlap,
                                            dropout_mode=vs_dropout_mode)
            # Factored binomial is the VS default; device_negatives=False
            # explicitly requests the host-TILED batch (the round-3 VS
            # path, kept for single-chip-parity testing).
            vs_factored = (getattr(model.decoder, "factorizable", False)
                           and not model.has_state and device_negatives)
            self.pipeline = VertexShardedBatchPipeline(
                self.vse, config, dataset, self.host_rng, sampler,
                slack=vs_slack, factored=vs_factored)
        else:
            self.vse = None
            self.pipeline = BatchPipeline(model, config, dataset,
                                          self.host_rng, sampler,
                                          device_negatives=device_negatives,
                                          shard_multiple=shard)
        # Each run dispatches K steps per executable (lax.scan over stacked
        # batches) to amortize per-dispatch transport; boundaries (reports,
        # validation checks, saves) fall back to the single-step path.
        # Mesh runs dispatch one (shard_map'd) step at a time.
        self.steps_per_dispatch = 1 if (model.has_state or mesh is not None) \
            else max(1, int(steps_per_dispatch))
        if vertex_sharded:
            from ..parallel.vertex_sharded import VertexShardedBatchPipeline
            self._extra_pipelines = [
                VertexShardedBatchPipeline(
                    self.vse, config, dataset,
                    np.random.default_rng(seed + 1000 + w), sampler,
                    budgets=self.pipeline.budgets,
                    factored=self.pipeline.factored)
                for w in range(max(0, prefetch_threads - 1))]
        else:
            self._extra_pipelines = [
                BatchPipeline(model, config, dataset,
                              np.random.default_rng(seed + 1000 + w), sampler,
                              device_negatives=device_negatives,
                              shard_multiple=shard)
                for w in range(max(0, prefetch_threads - 1))]
        self.optimizer = build_optimizer(config.optimizer)
        self.rng_key = jax.random.PRNGKey(seed)

        rate = config.training.negative_sample_rate
        n_entities = config.entity_count
        # 'split' = structured/factorized negatives (fast path; requires
        # a bilinear decoder and device negatives). 'binomial' = the
        # reference's per-slot coin-flip protocol.
        self.negative_mode = negative_mode
        factorizable = getattr(model.decoder, "factorizable", False)
        use_structured = (negative_mode == "split"
                          and device_negatives and not model.has_state
                          and factorizable)
        use_shared = (negative_mode == "shared"
                      and device_negatives and not model.has_state
                      and factorizable)
        self._use_structured = use_structured
        self._use_shared = use_shared
        # Binomial protocol with a bilinear decoder: compute the EXACT
        # tiled-batch objective through the factored formulation
        # (RGCNModel.loss_binomial_factored) — ~2x less decoder HBM
        # traffic, same corruption draws, same loss values.
        self._use_factored_binomial = (
            negative_mode == "binomial" and device_negatives
            and not model.has_state and not vertex_sharded and factorizable)
        # Vertex-sharded binomial: host-drawn corruption parts ride the
        # decoder halo (parallel/vertex_sharded.py:prepare_batch_factored)
        # — the beyond-HBM path runs the factored objective too (the
        # round-4 exclusion is lifted). Authoritative flag lives on the
        # pipeline (set at construction above).
        self._vs_factored = vertex_sharded and self.pipeline.factored
        self.negative_pool_size = negative_pool_size

        def train_step(params, opt_state, graph, triples, labels, mask, rng):
            if self._use_shared:
                pool = jax.random.randint(
                    jax.random.fold_in(rng, 778),
                    (self.negative_pool_size,), 0, n_entities,
                    dtype=triples.dtype)

                def loss_fn(p):
                    return model.loss_shared_negatives(
                        p, graph, triples, mask, pool, rng=rng,
                        deterministic=False)
                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = self.optimizer.update(grads, opt_state,
                                                           params)
                params = jax.tree_util.tree_map(lambda a, u: a + u, params,
                                                updates)
                return params, opt_state, loss

            if self._use_structured:
                neg_s, neg_o = device_negative_entities_split(
                    triples, rate, n_entities, jax.random.fold_in(rng, 777))

                def loss_fn(p):
                    return model.loss_structured(
                        p, graph, triples, mask, neg_s, neg_o, rng=rng,
                        deterministic=False)
                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = self.optimizer.update(grads, opt_state,
                                                           params)
                params = jax.tree_util.tree_map(lambda a, u: a + u, params,
                                                updates)
                return params, opt_state, loss

            if self._use_factored_binomial:
                values, co = device_negative_parts(
                    triples, rate, n_entities,
                    jax.random.fold_in(rng, 777))

                def loss_fn(p):
                    return model.loss_binomial_factored(
                        p, graph, triples, mask, values, co, rng=rng,
                        deterministic=False)
                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = self.optimizer.update(grads, opt_state,
                                                           params)
                params = jax.tree_util.tree_map(lambda a, u: a + u, params,
                                                updates)
                return params, opt_state, loss

            if self.pipeline.device_negatives:
                # triples/mask carry padded positives; corrupt on device.
                triples, labels, mask = device_negative_sample(
                    triples, mask, rate, n_entities,
                    jax.random.fold_in(rng, 777))

            def loss_fn(p):
                return model.loss(p, graph, triples, labels, mask, rng=rng,
                                  deterministic=False)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state,
                                                       params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
            return params, opt_state, loss

        if vertex_sharded:
            self._train_step = self.vse.make_train_step(
                self.optimizer, factored=self._vs_factored)
        elif mesh is not None:
            from ..parallel.mesh import make_sharded_train_step
            if not self.pipeline.device_negatives:
                sharded_mode = None  # host pre-tiles negatives
            elif use_structured:
                sharded_mode = "split"
            elif use_shared:
                sharded_mode = "shared"
            else:
                sharded_mode = "binomial"
            self._train_step = make_sharded_train_step(
                model, self.optimizer, mesh,
                has_graph=model.needs_graph(),
                negative_mode=sharded_mode, negative_rate=rate,
                negative_pool_size=negative_pool_size)
        else:
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1))

        def train_chunk(params, opt_state, batches, keys):
            """K steps in one executable: scan over stacked batches."""
            def body(carry, xs):
                params, opt_state = carry
                batch, key = xs
                params, opt_state, loss = train_step(
                    params, opt_state, batch.graph, batch.triples,
                    batch.labels, batch.mask, key)
                return (params, opt_state), loss
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (batches, keys))
            return params, opt_state, losses

        self._train_chunk = jax.jit(train_chunk, donate_argnums=(0, 1))

        def train_step_stateful(params, opt_state, cache, graph, edge_ids,
                                triples, labels, mask, rng):
            def loss_fn(p):
                return model.loss_stateful(p, cache, graph, edge_ids,
                                           triples, labels, mask, rng=rng)
            (loss, new_cache), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state,
                                                       params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
            return params, opt_state, new_cache, loss

        self._train_step_stateful = jax.jit(train_step_stateful,
                                            donate_argnums=(0, 1, 2))
        self.cache_state = (model.init_cache_state() if model.has_state
                            else None)

    def init_state(self, seed: int = 0):
        params = self.model.init_params(jax.random.PRNGKey(seed))
        if self.vertex_sharded:
            params = self.vse.pad_params(params)
        opt_state = self.optimizer.init(params)
        return params, opt_state

    def fit(self, params=None, opt_state=None, *,
            max_iterations: Optional[int] = None,
            max_seconds: Optional[float] = None,
            start_iteration: int = 0,
            checkpoint_path: Optional[str] = None) -> FitResult:
        cfg = self.config.optimizer
        if params is None:
            params, opt_state = self.init_state()
        if self.vertex_sharded:
            # Accept single-chip-shaped params (e.g. a resumed checkpoint):
            # pad the entity table and rebuild the optimizer state to the
            # padded shapes.
            w = params["input_transform"]["W"]
            if np.asarray(w).shape[0] != self.vse.v_pad:
                self.log("vertex-sharded fit: padding single-chip-shaped "
                         "params to the sharded layout and REINITIALIZING "
                         "optimizer state (existing moments, e.g. from a "
                         "single-chip checkpoint, are discarded)")
                params = self.vse.pad_params(params)
                opt_state = self.optimizer.init(params)
            params = self.vse.place_state(params)
            opt_state = self.vse.place_state(opt_state)
        elif self.mesh is not None:
            from ..parallel.mesh import replicate
            params = replicate(self.mesh, params)
            opt_state = replicate(self.mesh, opt_state)
        max_iter = max_iterations if max_iterations is not None \
            else cfg.max_iterations
        check_every = cfg.early_stopping_check_every
        save_every = cfg.save_every_n or check_every
        report_every = cfg.report_train_loss_every

        # (A producer-thread device_put transform was measured SLOWER on
        # this environment's tunneled TPU — transfers contend with the
        # main thread's dispatches — so batches ship at dispatch time;
        # _Prefetcher.transform remains available for hosts where async
        # placement wins.)
        source = _Prefetcher([self.pipeline] + self._extra_pipelines,
                             depth=2 * self.steps_per_dispatch,
                             start_offset=getattr(self, "_resume_rr", 0)) \
            if self.prefetch else self.pipeline
        started = time.time()
        cumulative_loss = 0.0
        previous_score = None
        best_score = None
        stopped = False
        loss = float("nan")
        i = start_iteration

        # Losses are fetched lazily: each step leaves its device scalar in
        # ``pending`` and the host syncs only at reporting/stopping/saving
        # boundaries (each host<->device sync costs ~tens of ms of
        # transport in tunneled environments).
        pending = []

        def process_pending():
            nonlocal cumulative_loss, loss
            for start_it, loss_dev in pending:
                if isinstance(loss_dev, jax.Array) \
                        and not loss_dev.is_fully_addressable:
                    # Multi-host mesh: read the local replica.
                    loss_dev = loss_dev.addressable_data(0)
                values = np.atleast_1d(np.asarray(loss_dev))
                for off, v in enumerate(values):
                    it_ = start_it + off
                    v = float(v)
                    loss = v
                    cumulative_loss += v
                    if it_ == 1:
                        cumulative_loss = 0.0
                        self.log(f"Initial loss: {v}")
                    elif report_every and it_ % report_every == 1:
                        avg = cumulative_loss / float(report_every)
                        cumulative_loss = 0.0
                        if it_ - report_every < start_iteration + 1:
                            # Resumed mid-window: the accumulator covers
                            # only the post-resume steps — don't print a
                            # mislabeled partial average.
                            continue
                        self.log(f"Average train loss for iteration "
                                 f"{it_ - report_every}-{it_ - 1}: {avg}")
                        self.metrics.log("train_loss", iteration=it_ - 1,
                                         loss=avg, **self.timer.summary())
            pending.clear()

        try:
            while True:
                if max_iter is not None and i >= max_iter:
                    break
                if max_seconds is not None and time.time() - started \
                        > max_seconds:
                    break
                # How many steps may run before the next host boundary
                # (initial-loss print, report, validation check, save, cap)?
                k = self.steps_per_dispatch
                for boundary in (1 if i < 1 else None,
                                 _next_boundary(i, report_every, offset=1),
                                 (_next_boundary(i, check_every)
                                  if self.scoring_function else None),
                                 _next_boundary(i, save_every)
                                 if checkpoint_path else None,
                                 max_iter):
                    if boundary is not None:
                        k = min(k, boundary - i)
                k = max(k, 1)

                step_edges = getattr(self.pipeline, "split_size", 0)
                timer_ctx = self.timer.step(
                    edges=step_edges * k, triples=k)
                timer_ctx.__enter__()
                if self.model.has_state:
                    i += 1
                    batch = source.next()
                    self.rng_key, step_key = jax.random.split(self.rng_key)
                    params, opt_state, self.cache_state, loss_dev = \
                        self._train_step_stateful(
                            params, opt_state, self.cache_state,
                            batch.graph, batch.edge_ids, batch.triples,
                            batch.labels, batch.mask, step_key)
                    pending.append((i, loss_dev))
                elif self.vertex_sharded:
                    # Row-sharded entity table: the VS step consumes the
                    # pipeline's statically-budgeted layout directly
                    # (steps_per_dispatch is 1; shapes identical across
                    # resampled subgraphs, so this compiles once).
                    for _ in range(k):
                        i += 1
                        batch = source.next()
                        self.rng_key, step_key = jax.random.split(
                            self.rng_key)
                        if self._vs_factored:
                            params, opt_state, loss_dev = self._train_step(
                                params, opt_state, batch.f_arrays,
                                batch.b_arrays, batch.triples, batch.mask,
                                batch.neg_values, batch.corrupt_object,
                                batch.dec_send, batch.e1_ptr,
                                batch.e2_ptr, batch.ev_ptr, step_key)
                        else:
                            params, opt_state, loss_dev = self._train_step(
                                params, opt_state, batch.f_arrays,
                                batch.b_arrays, batch.triples,
                                batch.labels, batch.mask, batch.dec_send,
                                batch.e1_ptr, batch.e2_ptr, step_key)
                        pending.append((i, loss_dev))
                elif self.mesh is not None or k < self.steps_per_dispatch:
                    # Mesh runs always take the single-step path: only
                    # self._train_step is the shard_map'd executable
                    # (steps_per_dispatch is forced to 1 for mesh, so the
                    # k < steps_per_dispatch test alone never fires and the
                    # scan path would silently run replicated).
                    # Otherwise: remainder before a host boundary — run k
                    # single steps through the (already-compiled) one-step
                    # executable. A k-sized scan would compile a NEW
                    # executable per distinct remainder size — each
                    # compile/cache-load costs seconds on a tunneled
                    # backend, easily dwarfing the steps themselves.
                    for _ in range(k):
                        i += 1
                        batch = source.next()
                        self.rng_key, step_key = jax.random.split(
                            self.rng_key)
                        g, t, y, m = (batch.graph, batch.triples,
                                      batch.labels, batch.mask)
                        if self.mesh is not None:
                            from ..parallel.mesh import shard_batch
                            g, t, y, m = shard_batch(self.mesh, g, t, y, m)
                        params, opt_state, loss_dev = self._train_step(
                            params, opt_state, g, t, y, m, step_key)
                        pending.append((i, loss_dev))
                else:
                    batches = [source.next() for _ in range(k)]
                    stacked = jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs)
                        if isinstance(xs[0], jax.Array) else np.stack(xs),
                        *batches)
                    keys = jax.random.split(self.rng_key, k + 1)
                    self.rng_key = keys[0]
                    params, opt_state, losses = self._train_chunk(
                        params, opt_state, stacked, keys[1:])
                    pending.append((i + 1, losses))
                    i += k
                timer_ctx.__exit__(None, None, None)

                # TrainLossReporter (shared/algorithms.py:82-116), deferred:
                # (chunk boundaries land on i % report_every == 1, where the
                # reference prints the previous window's average)
                if i == 1 or (report_every and i % report_every == 1):
                    process_pending()

                # EarlyStopper (shared/algorithms.py:119-161)
                if self.scoring_function is not None and check_every \
                        and i % check_every == 0:
                    process_pending()
                    score = self.scoring_function(params)
                    if jax.process_count() > 1:
                        # Every process must take the same stop/continue
                        # branch or the cluster deadlocks at the next
                        # collective; broadcast process 0's score rather
                        # than assuming process-local evals are
                        # bit-identical.
                        from jax.experimental import multihost_utils
                        score = float(multihost_utils.broadcast_one_to_all(
                            np.float64(score)))
                    self.log(f"Tested validation score at iteration {i}. "
                             f"Result: {score}")
                    self.metrics.log("validation", iteration=i, score=score)
                    if best_score is None or score > best_score:
                        best_score = score
                    if previous_score is not None and not (
                            score > previous_score):
                        if i > cfg.early_stopping_burnin:
                            self.log("Stopping criterion reached.")
                            stopped = True
                            break
                        self.log("Ignoring criterion while in burn-in phase.")
                    previous_score = score

                # ModelSaver (shared/algorithms.py:61-79); skipped when the
                # stopper fired, matching the decorator order.
                if checkpoint_path and save_every and i % save_every == 0 \
                        and jax.process_index() == 0:
                    process_pending()
                    if isinstance(source, _Prefetcher):
                        pipe_states, rr = source.states()
                    else:
                        pipe_states, rr = [self.pipeline.state()], 0
                    save_params, save_opt = params, opt_state
                    if jax.process_count() > 1:
                        from ..parallel.distributed import fetch_replicated
                        save_params = fetch_replicated(params)
                        save_opt = fetch_replicated(opt_state)
                    ckpt_lib.save(checkpoint_path, params=save_params,
                                  opt_state=save_opt, step=i,
                                  rng_key=self.rng_key,
                                  host_rng_state=self.host_rng.bit_generator.state,
                                  extra={"pipeline_states": pipe_states,
                                         "rr": rr})
                    self.log("saving...")
        finally:
            if isinstance(source, _Prefetcher):
                source.close()
        process_pending()

        return FitResult(params=params, opt_state=opt_state, iterations=i,
                         stopped_early=stopped, last_loss=loss,
                         best_score=best_score)

    def resume(self, checkpoint_path: str, **fit_kwargs) -> FitResult:
        """Restore the full train state and continue fitting — the resume
        path the reference never had. Restores device PRNG, every batch
        pipeline's host state at its consumption point, and the prefetcher's
        round-robin position, so the resumed batch stream is bit-identical
        to an uninterrupted run."""
        state = ckpt_lib.restore_latest(checkpoint_path)
        if state is None:
            raise FileNotFoundError(f"no checkpoint at {checkpoint_path}")
        self.rng_key = jnp.asarray(state["rng_key"])
        if state.get("host_rng_state"):
            self.host_rng.bit_generator.state = state["host_rng_state"]
        extra = state.get("extra") or {}
        pipe_states = extra.get("pipeline_states")
        if pipe_states:
            pipelines = [self.pipeline] + self._extra_pipelines
            for p, st in zip(pipelines, pipe_states):
                p.set_state(st)
            self._resume_rr = extra.get("rr", 0)
        return self.fit(params=state["params"],
                        opt_state=state["opt_state"],
                        start_iteration=state["step"],
                        checkpoint_path=checkpoint_path, **fit_kwargs)
