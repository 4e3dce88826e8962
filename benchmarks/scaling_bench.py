#!/usr/bin/env python
"""Edge-partitioned scaling efficiency on a virtual device mesh.

Real multi-chip hardware is not available in this environment (one TPU chip
behind a tunnel), so scaling *correctness* and *efficiency structure* are
exercised on a virtual CPU mesh (`--xla_force_host_platform_device_count`).
CPU-mesh timings measure the partitioning overhead structure (collective
count, per-shard work reduction), not ICI bandwidth; treat the efficiency
figures as an upper-bound sanity check of the sharding design rather than
hardware numbers.

Usage: python benchmarks/scaling_bench.py [--devices 1 2 4 8]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    parser.add_argument("--edges", type=int, default=32768)
    parser.add_argument("--dim", type=int, default=128)
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from relationprediction_tpu import config as config_lib
    from relationprediction_tpu.data import synthetic
    from relationprediction_tpu.models import build_model
    from relationprediction_tpu.parallel import (make_mesh,
                                                 make_sharded_train_step,
                                                 replicate, shard_batch)
    from relationprediction_tpu.training import BatchPipeline
    from relationprediction_tpu.training.optimizers import build_optimizer
    import dataclasses

    ds = synthetic.generate(2000, 32, args.edges, seed=0)
    cfg = config_lib.load(os.path.join(os.path.dirname(__file__), "..",
                                       "settings", "gcn_block.exp"))
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, code_dimension=args.dim,
                                    internal_dimension=args.dim, n_bases=16),
        decoder=dataclasses.replace(cfg.decoder, code_dimension=args.dim))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    model = build_model(cfg)
    params0 = model.init_params(jax.random.PRNGKey(0))
    optimizer = build_optimizer(cfg.optimizer)

    pipeline = BatchPipeline(model, cfg, ds, np.random.default_rng(0),
                             sampler="uniform")
    batch = pipeline.next()
    # CPU-mesh timing: Pallas layouts run in INTERPRET mode on CPU and
    # would swamp the structure measurement — force the XLA segment-sum
    # aggregation (this bench measures partitioning overhead, not the
    # kernel; sc2-under-mesh parity has its own tests).
    batch = batch._replace(graph=batch.graph._replace(
        sc_fwd=None, sc_bwd=None, sc2_fwd=None, sc2_bwd=None))

    results = {}
    for n in args.devices:
        mesh = make_mesh(n)
        step = make_sharded_train_step(model, optimizer, mesh)
        params = replicate(mesh, params0)
        opt_state = replicate(mesh, optimizer.init(params0))
        g, t, y, m = shard_batch(mesh, batch.graph, batch.triples,
                                 batch.labels, batch.mask)
        # warmup/compile
        p, s, loss = step(params, opt_state, g, t, y, m,
                          jax.random.PRNGKey(0))
        float(loss)
        t0 = time.perf_counter()
        for i in range(args.iters):
            p, s, loss = step(p, s, g, t, y, m, jax.random.PRNGKey(i))
        float(loss)
        dt = (time.perf_counter() - t0) / args.iters
        eps = pipeline.split_size / dt
        results[n] = eps
        base = results[args.devices[0]]
        eff = eps / (base * n / args.devices[0])
        print(f"devices={n}: {dt * 1e3:8.2f} ms/step  "
              f"{eps / 1e6:6.2f}M edges/s  efficiency={eff:5.1%}",
              flush=True)


if __name__ == "__main__":
    main()
