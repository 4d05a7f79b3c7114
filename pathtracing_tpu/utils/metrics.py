"""Render metrics: Mrays/s, samples/s, step timing, JSONL emission.

The reference's only metric is an FPS value logged per frame and recorded
nowhere (`Renderer.cs:1046`). This module provides the structured metric
path BASELINE.json measures: per-step wall clock, Mrays/s (primary +
secondary rays actually traced), samples/s, and an optional JSONL sink for
the benchmark harness.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import List, Optional

from pathtracing_tpu.utils import logging as ptlog


def rays_per_sample(width: int, height: int, max_depth: int,
                    avg_path_length: Optional[float] = None) -> float:
    """Rays traced for one sample of every pixel.

    Without measured path statistics we count the worst case (max_depth
    intersections per path); pass ``avg_path_length`` from
    ``measure_path_length`` for the honest number used in benchmarks.
    """
    per_path = avg_path_length if avg_path_length is not None else max_depth
    return float(width * height) * per_path


@dataclass
class StepMetrics:
    step: int
    seconds: float
    samples_added: int
    total_spp: int
    mrays_per_s: float
    samples_per_s: float


@dataclass
class MetricsLog:
    jsonl_path: Optional[str] = None
    history: List[StepMetrics] = field(default_factory=list)

    def record(self, m: StepMetrics) -> None:
        self.history.append(m)
        ptlog.log_information(
            "step %d: %.3fs  %+d spp (total %d)  %.1f Mrays/s  %.2e samples/s",
            m.step, m.seconds, m.samples_added, m.total_spp,
            m.mrays_per_s, m.samples_per_s,
        )
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(m.__dict__) + "\n")


class Timer:
    """Wall-clock context timer (host side; device work must be blocked on
    by the caller via jax.block_until_ready before exit)."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self.start
        return False
