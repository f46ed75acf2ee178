"""Pipeline metrics: a tiny named-actor collector (the one legitimately
shared mutable state — reference util/metrics.js kept in-process
counters; here every task/driver can report to one place)."""

from __future__ import annotations

import time

import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self.stages = {}
        self.counters = {}

    def record_stage(self, name: str, wall_sec: float, rows: int | None = None):
        s = self.stages.setdefault(name, {"wall_sec": 0.0, "rows": 0, "calls": 0})
        s["wall_sec"] += wall_sec
        s["calls"] += 1
        if rows is not None:
            s["rows"] += rows

    def incr(self, name: str, n: int = 1):
        self.counters[name] = self.counters.get(name, 0) + n

    def snapshot(self):
        return {"stages": dict(self.stages), "counters": dict(self.counters)}


def get_metrics_actor(name: str = "georay_metrics"):
    try:
        return ray.get_actor(name)
    except ValueError:
        return MetricsActor.options(name=name, lifetime="detached", get_if_exists=True).remote()


class StageTimer:
    """Driver-side stage timing context."""

    def __init__(self, report: dict, name: str):
        self.report = report
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.report[self.name] = round(time.perf_counter() - self.t0, 4)
