"""Wall-clock instrumentation (reference dsgrid/utils/timing.py:123-207).

``track_timing`` collects per-function call counts / total / min / max;
``timer_stats.report()`` renders the summary the reference logs at the
end of a run. Driver-side only — never on the executor data path.
"""

from __future__ import annotations

import functools
import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class _Stat:
    count: int = 0
    total: float = 0.0
    min: float = float("inf")
    max: float = 0.0

    def add(self, elapsed: float) -> None:
        self.count += 1
        self.total += elapsed
        self.min = min(self.min, elapsed)
        self.max = max(self.max, elapsed)


@dataclass
class TimerStats:
    stats: dict[str, _Stat] = field(default_factory=dict)

    def record(self, name: str, elapsed: float) -> None:
        self.stats.setdefault(name, _Stat()).add(elapsed)

    @contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(name, time.perf_counter() - t0)

    def report(self) -> str:
        lines = [f"{'name':<40} {'n':>5} {'total_s':>9} {'min_s':>8} {'max_s':>8}"]
        for name, s in sorted(self.stats.items(), key=lambda kv: -kv[1].total):
            lines.append(
                f"{name:<40} {s.count:>5} {s.total:>9.3f} {s.min:>8.3f} {s.max:>8.3f}"
            )
        return "\n".join(lines)

    def clear(self) -> None:
        self.stats.clear()


timer_stats = TimerStats()


def track_timing(fn=None, *, stats: TimerStats | None = None):
    """Decorator recording wall time per call under the function's name."""

    def wrap(f):
        target = stats or timer_stats

        @functools.wraps(f)
        def inner(*args, **kwargs):
            with target.time(f.__qualname__):
                return f(*args, **kwargs)

        return inner

    return wrap(fn) if fn is not None else wrap
