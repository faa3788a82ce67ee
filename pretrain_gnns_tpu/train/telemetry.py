"""Throughput + profiling instrumentation — a new subsystem (SURVEY.md §5.1:
the reference's only instrumentation is tqdm bars; the north-star metric
here is edges/s/chip).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import numpy as np


class ThroughputMeter:
    """Counts valid edges/nodes/graphs per wall-second across train steps.

    Usage:
        meter = ThroughputMeter()
        for batch in loader:
            counts = meter.counts_of(batch)   # host-side, before transfer
            state, loss = step(state, batch)
            meter.tick(**counts)
        print(meter.report())
    """

    def __init__(self, n_chips: int = 1):
        self.n_chips = n_chips
        self.reset()

    def reset(self) -> None:
        self.edges = 0
        self.nodes = 0
        self.graphs = 0
        self.steps = 0
        self._t0 = time.perf_counter()

    @staticmethod
    def counts_of(batch) -> Dict[str, int]:
        return {
            "edges": int(np.asarray(batch.edge_mask).sum()),
            "nodes": int(np.asarray(batch.node_mask).sum()),
            "graphs": int(np.asarray(batch.graph_mask).sum()),
        }

    def tick(self, edges: int = 0, nodes: int = 0, graphs: int = 0) -> None:
        self.edges += edges
        self.nodes += nodes
        self.graphs += graphs
        self.steps += 1

    @property
    def seconds(self) -> float:
        return time.perf_counter() - self._t0

    def edges_per_sec(self) -> float:
        return self.edges / max(self.seconds, 1e-9)

    def edges_per_sec_per_chip(self) -> float:
        return self.edges_per_sec() / max(self.n_chips, 1)

    def report(self) -> Dict[str, float]:
        s = max(self.seconds, 1e-9)
        return {
            "steps": self.steps,
            "seconds": round(s, 3),
            "edges_per_sec": round(self.edges / s, 1),
            "edges_per_sec_per_chip": round(
                self.edges / s / max(self.n_chips, 1), 1
            ),
            "graphs_per_sec": round(self.graphs / s, 1),
            "step_ms": round(s / max(self.steps, 1) * 1e3, 3),
        }


def scaling_efficiency(
    base_edges_per_sec: float, base_chips: int,
    scaled_edges_per_sec: float, scaled_chips: int,
) -> float:
    """edges/s scaling efficiency vs linear (BASELINE.md target >= 0.8)."""
    ideal = base_edges_per_sec / base_chips * scaled_chips
    return scaled_edges_per_sec / ideal


@contextlib.contextmanager
def profile(log_dir: Optional[str]):
    """jax profiler trace when log_dir is set; no-op otherwise. View with
    tensorboard or xprof."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
