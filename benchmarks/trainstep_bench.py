#!/usr/bin/env python
"""End-to-end train-step benchmark at the reference's real workload:
gcn_block.exp on FB15k-237-scale data (30k-edge neighborhood batch, 15k-edge
message split, 330k negative-sampled loss triples, d=500, B=100)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import dataclasses

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from relationprediction_tpu import config as config_lib
    from relationprediction_tpu.data import synthetic
    from relationprediction_tpu.models import build_model
    from relationprediction_tpu.training import BatchPipeline, TrainLoop

    exp = sys.argv[1] if len(sys.argv) > 1 else "gcn_block"
    mode = sys.argv[2] if len(sys.argv) > 2 else "binomial"
    ds = synthetic.like("FB15k-237", seed=0)
    cfg = config_lib.load(os.path.join(os.path.dirname(__file__), "..",
                                       "settings", f"{exp}.exp"))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    model = build_model(cfg)

    loop = TrainLoop(model, cfg, ds, seed=0, log=lambda s: None,
                     prefetch=True, negative_mode=mode)
    params, opt_state = loop.init_state()

    # Warm up: compile BOTH the single-step and the chunked executables
    # (12 iterations crosses one full chunk boundary).
    t0 = time.perf_counter()
    result = loop.fit(params, opt_state, max_iterations=12)
    print(f"compile+12 iters: {time.perf_counter() - t0:.1f}s", flush=True)

    n = 40
    t0 = time.perf_counter()
    result = loop.fit(result.params, result.opt_state,
                      start_iteration=12, max_iterations=12 + n)
    dt = (time.perf_counter() - t0) / n
    edges = loop.pipeline.split_size
    triples = loop.pipeline.n_loss_triples
    print(f"{exp}: {dt * 1e3:.1f} ms/step  "
          f"{edges / dt / 1e6:.2f}M msg-edges/s  "
          f"{triples / dt / 1e6:.2f}M triples/s  "
          f"(split={edges}, loss_triples={triples})", flush=True)
    print("timer:", loop.timer.summary(), flush=True)


if __name__ == "__main__":
    main()
