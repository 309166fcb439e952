"""Tracing / profiling helpers.

The reference has no profiling beyond wall-clock FPS prints (SURVEY.md §5.1).
Here: jax.profiler trace capture as a context manager + a lightweight
per-phase step timer whose summaries feed the progress logs.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict, deque
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto) when
    log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall-clock per named phase ('env_step', 'var_reward',
    'policy_act', 'ppo_update', ...). Keeps a bounded window of recent
    samples per phase so p50_ms reports a true median — the cumulative
    mean would let one compile-time outlier (seconds) pollute the
    steady-state number (milliseconds) for the whole run."""

    WINDOW = 512  # recent samples kept per phase

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.samples: Dict[str, deque] = defaultdict(
            lambda: deque(maxlen=self.WINDOW))

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            self.samples[name].append(dt)

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": round(self.totals[k], 4),
                "count": self.counts[k],
                "mean_ms": round(1e3 * self.totals[k] / max(1, self.counts[k]), 3),
                "p50_ms": round(self.p50_ms(k), 3),
            }
            for k in sorted(self.totals)
        }

    def p50_ms(self, name: str) -> float:
        window = self.samples.get(name)
        if not window:
            return 0.0
        ordered = sorted(window)
        return 1e3 * ordered[len(ordered) // 2]

    def reset(self):
        self.totals.clear()
        self.counts.clear()
        self.samples.clear()


def host_rss_gb() -> float:
    """Current process resident set size in GiB (0.0 if unreadable)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024 / 1024
    except OSError:  # pragma: no cover - non-procfs platforms
        pass
    return 0.0


class RSSWatchdog:
    """Warns (once) when host RSS approaches physical memory.

    Motivation: the tunneled TPU backend in this environment leaks every
    host<->device transfer buffer (~payload-sized, measured ~213 KB per
    device_put in isolation; not GC-reachable — a native client leak).
    Long host-path RL runs accumulate it linearly with step count: a
    760k-step grid run reached 127 GB RSS and was OOM-killed. The
    device-resident sim path (rl/device_sim.py) transfers almost nothing
    per update and sidesteps the issue; for host-path runs this watchdog
    surfaces the drift early so the run can be checkpoint-resumed instead
    of dying silently (full-state resume: train/rl.py load_policy_state).
    """

    def __init__(self, frac: float = 0.8):
        self.limit_gb = 0.0
        try:
            with open("/proc/meminfo") as f:
                for line in f:
                    if line.startswith("MemTotal"):
                        self.limit_gb = (int(line.split()[1]) / 1024 / 1024
                                         * frac)
                        break
        except OSError:  # pragma: no cover
            pass
        self._warned = False

    def check(self) -> float:
        rss = host_rss_gb()
        if self.limit_gb and rss > self.limit_gb and not self._warned:
            self._warned = True
            import warnings

            warnings.warn(
                f"host RSS {rss:.1f} GiB exceeds {self.limit_gb:.0f} GiB "
                "(80% of RAM) — on the tunneled TPU backend every transfer "
                "leaks host memory (see ROADMAP.md); checkpoint-resume the "
                "run, or switch to RLDeviceSimRollout which transfers "
                "almost nothing per update")
        return rss
