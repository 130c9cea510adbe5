"""Profiling plane: named stage timers + per-frame metric records.

TPU-native replacement of the reference trace plane — vk::PerformanceMonitor
with SVO_START_TIMER/SVO_LOG channels (reference: include/plsvo/global.h:102-117,
registration src/frame_handler_base.cpp:58-86: timers `pyramid_creation`,
`sparse_img_align`, `reproject`, `feature_align`, `pose_optimizer`,
`point_optimizer`, `local_ba`, `tot_time`; log channels
`img_align_n_tracked`, `sfba_*`, `n_candidates`, `dropout`). The reference
compiles its tracing out (SVO_TRACE never defined, SURVEY §5.1); here it is
always available and cheap.

For kernel-level TPU profiling use `jax.profiler.trace` around a run and
inspect with Perfetto; `annotate` wraps stages in named TraceAnnotations so
device timelines carry pipeline stage names.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, List


@dataclass
class PerformanceMonitor:
    """Per-frame stage timers + scalar log channels (vk::PerformanceMonitor
    analogue). Call new_frame() per iteration; timers accumulate within the
    frame; dump writes JSONL traces (Config::traceDir analogue)."""

    timers: Dict[str, float] = field(default_factory=dict)
    logs: Dict[str, float] = field(default_factory=dict)
    frames: List[dict] = field(default_factory=list)
    _starts: Dict[str, float] = field(default_factory=dict)

    def new_frame(self, frame_id: int):
        if self.timers or self.logs:
            self.frames.append(
                {"frame": self._frame_id, **{f"t_{k}": v for k, v in self.timers.items()},
                 **self.logs})
        self.timers = {}
        self.logs = {}
        self._frame_id = frame_id

    @contextlib.contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            import jax.profiler

            ctx = jax.profiler.TraceAnnotation(name)
            ctx.__enter__()
        except Exception:
            ctx = None
        try:
            yield
        finally:
            if ctx is not None:
                ctx.__exit__(None, None, None)
            self.timers[name] = self.timers.get(name, 0.0) + (
                time.perf_counter() - t0)

    def log(self, name: str, value):
        self.logs[name] = float(value)

    def finish(self):
        self.new_frame(-1)

    def dump(self, path: str):
        self.finish()
        with open(path, "w") as fh:
            for rec in self.frames:
                fh.write(json.dumps(rec) + "\n")

    def summary(self) -> Dict[str, float]:
        """Mean per-stage milliseconds over recorded frames."""
        acc = defaultdict(list)
        for rec in self.frames:
            for k, v in rec.items():
                if k.startswith("t_"):
                    acc[k].append(v)
        return {k: 1000.0 * sum(v) / len(v) for k, v in acc.items() if v}


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an XLA/TPU profile viewable in Perfetto/TensorBoard."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
