#!/usr/bin/env python
"""Experiment driver CLI.

TPU-native counterpart of the reference entry point
(``code/train.py`` / ``run-train.sh``):

    python train.py --settings settings/gcn_basis.exp --dataset <dir>

Loads an .exp settings file, wires dataset + model + scorer + training
engine, trains with validation-MRR early stopping, and reports test metrics.
Additions over the reference: --resume (full train-state restore),
--max-iterations / --max-seconds budget caps, --sampler fast path, and a
synthetic dataset escape hatch for missing public splits.
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from relationprediction_tpu import config as config_lib
from relationprediction_tpu.data import dataset as dataset_lib
from relationprediction_tpu.data import synthetic
from relationprediction_tpu.evaluation import Scorer
from relationprediction_tpu.models.build import JittedModelView, build_model
from relationprediction_tpu.training import TrainLoop


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Train a model on a given dataset.")
    parser.add_argument("--settings", required=True,
                        help="Filepath for settings (.exp) file.")
    parser.add_argument("--dataset", required=True,
                        help="Dataset directory, or synth:<profile> "
                             "(e.g. synth:FB15k-237).")
    parser.add_argument("--max-iterations", type=int, default=None)
    parser.add_argument("--max-seconds", type=float, default=None)
    parser.add_argument("--resume", action="store_true",
                        help="Resume from the experiment checkpoint.")
    parser.add_argument("--sampler", default="neighborhood",
                        choices=["neighborhood", "uniform"],
                        help="Subgraph sampler (uniform = faster host path).")
    parser.add_argument("--negative-mode", default="binomial",
                        choices=["binomial", "split", "shared"],
                        help="binomial = reference coin-flip corruption; "
                             "split = factorized fast path; shared = "
                             "shared-pool GEMM path (bilinear decoders).")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true",
                        help="Force CPU execution.")
    parser.add_argument("--mesh", type=int, default=None, metavar="N",
                        help="Edge-partitioned multi-chip training over the "
                             "first N devices (jax.sharding.Mesh; training "
                             "step AND evaluation run sharded).")
    parser.add_argument("--vertex-sharded", action="store_true",
                        help="Shard the VERTEX axis over the mesh (row-"
                             "sharded entity table + targeted halo "
                             "exchange) for beyond-HBM entity counts; "
                             "requires --mesh.")
    parser.add_argument("--vs-overlap", action="store_true",
                        help="Overlap the halo exchange with local "
                             "message computation (vertex-sharded only).")
    parser.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                        help="Multi-host: jax.distributed coordinator "
                             "address (process 0 binds it).")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--local-devices", type=int, default=None,
                        help="Virtual device count per process (CPU "
                             "simulation of a multi-host slice).")
    args = parser.parse_args()

    multihost = args.coordinator is not None or args.num_processes is not None
    if multihost:
        from relationprediction_tpu.parallel.distributed import init_runtime
        init_runtime(coordinator_address=args.coordinator,
                     num_processes=args.num_processes,
                     process_id=args.process_id,
                     local_device_count=args.local_devices,
                     platform="cpu" if args.cpu else None)
        if jax.process_index() != 0:
            # Non-coordinators stay silent; device work is identical.
            import builtins
            builtins.print = lambda *a, **k: None
    elif args.cpu:
        jax.config.update("jax_platforms", "cpu")

    # Same compilation-cache policy as rgcn-eval: honor the user's env,
    # default to the shared cache (the fused layer costs ~11 s cold even
    # after the round-4 compile fix; the full step far more).
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    cfg = config_lib.load(args.settings)

    if args.dataset.startswith("synth:"):
        profile = args.dataset.split(":", 1)[1]
        if profile not in synthetic.PROFILES:
            parser.error(f"unknown synthetic profile {profile!r}; choose "
                         f"from {sorted(synthetic.PROFILES)}")
        ds = synthetic.like(profile, seed=args.seed)
    else:
        ds = dataset_lib.load(args.dataset, metric=cfg.training.metric)
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    print(f"Dataset {ds.name}: {ds.n_entities} entities, "
          f"{ds.n_relations} relations, {len(ds.train)} train triples")

    model = build_model(cfg)

    mesh = None
    if args.mesh is not None:
        if args.mesh > len(jax.devices()):
            parser.error(f"--mesh {args.mesh} but only {len(jax.devices())} "
                         "devices are attached")
        if multihost:
            from relationprediction_tpu.parallel.distributed import (
                make_global_mesh)
            mesh = make_global_mesh(args.mesh)
        else:
            from relationprediction_tpu.parallel import make_mesh
            mesh = make_mesh(args.mesh)
        print(f"Mesh: {mesh.devices.size} devices over "
              f"{jax.process_count()} process(es), edge-partitioned")
    n_shards = mesh.devices.size if mesh is not None else 1
    if args.vertex_sharded and mesh is None:
        parser.error("--vertex-sharded requires --mesh")

    # Test-mode graph = the full training graph (``train.py:255-256``).
    eval_graph = None
    if args.vertex_sharded:
        # Row-sharded entity table: evaluation runs through the
        # vertex-sharded view (decoder GEMMs against each chip's code
        # rows); the full-train-graph halo layouts are its eval graph.
        from relationprediction_tpu.parallel.vertex_sharded import (
            VertexShardedEncoder, VertexShardedModelView)
        vse_eval = VertexShardedEncoder(model, mesh)
        per_shard = np.bincount(
            np.asarray(ds.train)[:, 2] // vse_eval.rows_per,
            minlength=n_shards)
        per_shard_b = np.bincount(
            np.asarray(ds.train)[:, 0] // vse_eval.rows_per,
            minlength=n_shards)
        pad = _round_up(int(max(per_shard.max(), per_shard_b.max())), 8)
        f_arr, b_arr = vse_eval.prepare(ds.train, pad_to=pad)
        view = VertexShardedModelView(vse_eval, f_arr, b_arr)
    else:
        # Evaluation under multi-host runs process-locally (every process
        # computes the identical scores from the replicated params), so
        # the model view is built without the process-spanning mesh.
        view = JittedModelView(model, mesh=None if multihost else mesh)
        if model.needs_graph():
            eval_graph = model.make_graph(
                ds.train, pad_to=_round_up(len(ds.train),
                                           int(np.lcm(128, n_shards))),
                shard_align=int(np.lcm(8, n_shards)), sc_shards=n_shards)

    scorer = Scorer(metric=cfg.training.metric)
    scorer.register_data(ds.train)
    scorer.register_data(ds.valid)
    scorer.register_data(ds.test)
    scorer.register_degrees(ds.train)
    scorer.register_model(view, None, eval_graph, n_entities=ds.n_entities)
    scorer.finalize_frequency_computation(ds.all_triples())

    metric_key = ("MRR" if cfg.training.metric == "MRR" else "Accuracy")

    def score_validation_data(params) -> float:
        """Early-stopping score: validation filtered metric; also prints the
        test metrics each check (``train.py:110-126``)."""
        if multihost:
            from relationprediction_tpu.parallel.distributed import (
                fetch_replicated)
            params = fetch_replicated(params)
        scorer.set_params(params)
        summary = scorer.compute_scores(ds.valid)
        early_stopping = summary.results["Filtered"][metric_key]
        scorer.compute_scores(ds.test).pretty_print()
        return early_stopping

    loop = TrainLoop(model, cfg, ds, scoring_function=score_validation_data,
                     sampler=args.sampler, seed=args.seed,
                     negative_mode=args.negative_mode, mesh=mesh,
                     vertex_sharded=args.vertex_sharded,
                     vs_overlap=args.vs_overlap)

    checkpoint_path = cfg.training.experiment_name
    t0 = time.time()
    if args.resume:
        result = loop.resume(checkpoint_path,
                             max_iterations=args.max_iterations,
                             max_seconds=args.max_seconds)
    else:
        result = loop.fit(max_iterations=args.max_iterations,
                          max_seconds=args.max_seconds,
                          checkpoint_path=checkpoint_path)
    wall = time.time() - t0

    print(f"Training done: {result.iterations} iterations in {wall:.1f}s "
          f"(early stop: {result.stopped_early})")
    final_params = result.params
    if multihost:
        from relationprediction_tpu.parallel.distributed import (
            fetch_replicated)
        final_params = fetch_replicated(final_params)
    scorer.set_params(final_params)
    print("Final test metrics:")
    scorer.compute_scores(ds.test).pretty_print()


if __name__ == "__main__":
    main()
