"""Subprocess worker for the multi-host runtime test.

Joins a jax.distributed cluster as one process of a CPU-simulated
multi-host slice, trains a small model on Toy over the GLOBAL 8-device
mesh through the production TrainLoop, and writes its result (last loss +
parameter checksum) as JSON.

Usage: python multihost_worker.py <pid> <nproc> <port> <local_devices> <out>
           [mode] [ckpt_dir]

mode: 'straight' (default) — fit 6 steps;
      'phase1' — fit 3 steps, checkpointing at step 3, then EXIT (the
                 simulated failure);
      'phase2' — restart: restore the checkpoint and continue to step 6.
The restart discipline: every process restores the same coordinator-
written checkpoint (full train state incl. host RNG + pipeline states),
so the resumed cluster reproduces the uninterrupted run bit-for-bit.
"""
import json
import os
import sys


def main():
    pid, nproc, port, local_devices = map(int, sys.argv[1:5])
    out_path = sys.argv[5]
    mode = sys.argv[6] if len(sys.argv) > 6 else "straight"
    ckpt_dir = sys.argv[7] if len(sys.argv) > 7 else None

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from relationprediction_tpu.parallel.distributed import (
        fetch_replicated, init_runtime, make_global_mesh)
    init_runtime(coordinator_address=f"localhost:{port}",
                 num_processes=nproc, process_id=pid,
                 local_device_count=local_devices, platform="cpu")

    import dataclasses

    import jax
    import numpy as np

    from relationprediction_tpu import config as config_lib
    from relationprediction_tpu.data import dataset as dataset_lib
    from relationprediction_tpu.models import build_model
    from relationprediction_tpu.training import TrainLoop

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    ds = dataset_lib.load(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "data", "Toy"))
    cfg = config_lib.load("/root/reference/settings/gcn_basis.exp")
    # RP_MH_VARIANT=block runs the production fused-kernel path (sc2
    # layouts under the process-spanning mesh) and counts kernel traces
    # so the test can assert multi-host really exercises it.
    variant = os.environ.get("RP_MH_VARIANT", "basis")
    enc_kw = dict(code_dimension=16, internal_dimension=16, n_bases=4)
    if variant == "block":
        enc_kw.update(concatenation=True)  # 4 blocks of 4x4
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, **enc_kw),
        decoder=dataclasses.replace(cfg.decoder, code_dimension=16),
        optimizer=dataclasses.replace(cfg.optimizer, save_every_n=3))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    model = build_model(cfg)

    kernel_traces = {"n": 0}
    if variant == "block":
        from relationprediction_tpu.ops import staircase2 as s2lib
        real_bd = s2lib.block_direction

        def _counting(*a, **k):
            kernel_traces["n"] += 1
            return real_bd(*a, **k)

        s2lib.block_direction = _counting

    losses = []

    def log(msg):
        if msg.startswith("Initial loss:"):
            losses.append(float(msg.split(":")[1]))

    loop = TrainLoop(model, cfg, ds, seed=7, prefetch=False,
                     steps_per_dispatch=1, log=log,
                     mesh=make_global_mesh(8))
    if mode == "phase1":
        res = loop.fit(max_iterations=3, checkpoint_path=ckpt_dir)
    elif mode == "phase2":
        res = loop.resume(ckpt_dir, max_iterations=6)
    else:
        res = loop.fit(max_iterations=6)

    params = fetch_replicated(res.params)
    checksum = float(sum(np.abs(np.asarray(leaf)).sum()
                         for leaf in jax.tree_util.tree_leaves(params)))
    with open(out_path, "w") as f:
        json.dump({"pid": pid, "nproc": nproc,
                   "last_loss": float(res.last_loss),
                   "initial_loss": losses[0] if losses else None,
                   "checksum": checksum,
                   "kernel_traces": kernel_traces["n"]}, f)


if __name__ == "__main__":
    main()
