"""Observability: structured metric logging, step timing, profiler traces.

The reference's only observability is print statements (SURVEY.md §5). This
module provides the production equivalents:

  * MetricLogger — structured JSONL metric stream + human-readable echo;
  * StepTimer — per-step wall/device timing with edges/sec/chip derived
    counters (the BASELINE.json north-star metric);
  * trace() — context manager around jax.profiler for on-demand device
    traces.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Iterator, Optional


class MetricLogger:
    """Append-only JSONL metric log with optional stdout echo."""

    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a")

    def log(self, kind: str, **fields: Any) -> None:
        record = {"ts": time.time(), "kind": kind, **fields}
        if self._fh:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()
        if self.echo:
            body = " ".join(f"{k}={v}" for k, v in fields.items())
            print(f"[{kind}] {body}")

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None


@dataclass
class StepStats:
    steps: int = 0
    total_seconds: float = 0.0
    total_edges: int = 0
    total_triples: int = 0
    window: list = field(default_factory=list)

    @property
    def edges_per_sec(self) -> float:
        return self.total_edges / self.total_seconds if self.total_seconds \
            else 0.0

    @property
    def steps_per_sec(self) -> float:
        return self.steps / self.total_seconds if self.total_seconds else 0.0


class StepTimer:
    """Accumulates per-step timing and throughput counters.

    Usage::

        with timer.step(edges=n_edges, triples=n_triples):
            run_train_step()
    """

    def __init__(self, window_size: int = 100):
        self.stats = StepStats()
        self.window_size = window_size

    @contextlib.contextmanager
    def step(self, edges: int = 0, triples: int = 0) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        s = self.stats
        s.steps += 1
        s.total_seconds += dt
        s.total_edges += edges
        s.total_triples += triples
        s.window.append(dt)
        if len(s.window) > self.window_size:
            s.window.pop(0)

    def summary(self) -> Dict[str, float]:
        s = self.stats
        recent = sum(s.window) / len(s.window) if s.window else 0.0
        return {
            "steps": s.steps,
            "edges_per_sec": round(s.edges_per_sec, 1),
            "steps_per_sec": round(s.steps_per_sec, 3),
            "recent_step_ms": round(recent * 1e3, 2),
        }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace") -> Iterator[None]:
    """Capture a jax.profiler device trace for the enclosed block."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
