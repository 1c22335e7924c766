"""Periodic progress reporting + per-stage wall-time attribution.

The reference runs a metrics reporter thread that prints stage
percentages and GB/s every few seconds
(/root/reference/src/pipeline/metrics.rs:204-234, 331-385). The Spark
twin polls SparkContext.statusTracker() from a daemon thread: active
stages with task progress are printed at `interval_s`, and each
stage's first/last sighting bounds its wall time, giving a per-stage
time breakdown without any listener-bus plumbing (which pyspark does
not expose directly).
"""

from __future__ import annotations

import threading
import time


class ProgressReporter(threading.Thread):
    """Daemon poller: call start() before the action, stop() after.

    stage_seconds: {stage_id: approx wall seconds observed active}
    (poll-resolution bounded — stages shorter than `interval_s` may be
    missed entirely; this is a progress surface, not an exact profile).
    """

    def __init__(self, spark, interval_s: float = 10.0, sink=print):
        super().__init__(daemon=True)
        self.spark = spark
        self.interval_s = interval_s
        self.sink = sink
        self._halt = threading.Event()
        self._seen: dict[int, tuple[float, float, int, int]] = {}

    def run(self):
        tracker = self.spark.sparkContext.statusTracker()
        while not self._halt.wait(self.interval_s):
            now = time.time()
            parts = []
            try:
                for sid in tracker.getActiveStageIds():
                    info = tracker.getStageInfo(sid)
                    if info is None:
                        continue
                    first = self._seen.get(sid, (now, now, 0, 0))[0]
                    self._seen[sid] = (first, now, info.numCompletedTasks,
                                       info.numTasks)
                    parts.append(
                        f"stage {sid}: {info.numCompletedTasks}/{info.numTasks}"
                        f" tasks ({now - first:.0f}s)")
            except Exception:
                continue  # context shutting down mid-poll
            if parts:
                self.sink("[progress] " + "; ".join(parts))

    def stop(self) -> dict[int, float]:
        self._halt.set()
        self.join(timeout=self.interval_s + 1)
        return self.stage_seconds()

    def stage_seconds(self) -> dict[int, float]:
        """Raw observed span per stage (last sighting - first). A stage
        seen once reports 0.0; true resolution is ±interval_s per edge
        — reported as-is rather than inflated to the poll interval,
        which would overstate sub-interval stages and skew the
        stage_pct breakdown (ADVICE r2)."""
        return {sid: round(last - first, 1)
                for sid, (first, last, _, _) in self._seen.items()}
