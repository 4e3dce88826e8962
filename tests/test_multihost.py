"""Multi-host runtime: 2 simulated processes == 1 process, exactly.

Spawns subprocess workers that join a jax.distributed cluster on the CPU
backend (gloo cross-process collectives, 4 virtual devices per process ->
one global 8-device mesh) and train through the production TrainLoop.
The same worker run as a single 8-device process is the reference: the
per-device computation (shard_map step, per-shard negative RNG folded by
mesh position) is independent of the process layout, so losses and final
parameters must agree to float tolerance.

This is the CPU-testable form of the multi-host v5p-slice runtime
(parallel/distributed.py); the reference has nothing comparable (one
tf.Session, ``code/train.py:278``).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _clean_env():
    env = dict(os.environ)
    # The worker forces the cpu platform itself; scrub flags the parent
    # test session set so the subprocess device count is what it asks for.
    env.pop("XLA_FLAGS", None)
    return env


def _run_cluster(nproc, local_devices, tmpdir, timeout=600):
    port = _free_port()
    procs, outs = [], []
    for pid in range(nproc):
        out = os.path.join(tmpdir, f"proc{nproc}_{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), str(port),
             str(local_devices), out],
            env=_clean_env(), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    results = []
    for p, out in zip(procs, outs):
        stdout, stderr = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"
        with open(out) as f:
            results.append(json.load(f))
    return results


def test_two_process_training_matches_single_process(tmp_path):
    two = _run_cluster(2, 4, str(tmp_path))
    one = _run_cluster(1, 8, str(tmp_path))

    # Both processes of the 2-proc run observed the identical replicated
    # state.
    assert two[0]["last_loss"] == pytest.approx(two[1]["last_loss"],
                                                rel=1e-6)
    assert two[0]["checksum"] == pytest.approx(two[1]["checksum"], rel=1e-6)

    # Process layout is an implementation detail: 2x4 == 1x8.
    assert np.isfinite(two[0]["last_loss"])
    assert two[0]["initial_loss"] == pytest.approx(one[0]["initial_loss"],
                                                   rel=5e-4)
    assert two[0]["last_loss"] == pytest.approx(one[0]["last_loss"],
                                                rel=5e-4)
    assert two[0]["checksum"] == pytest.approx(one[0]["checksum"], rel=1e-3)
