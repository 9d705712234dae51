"""Failure detection & graceful degradation (SURVEY.md §5).

The reference degrades instead of dying: EP downgrade at init
(model.ts:14-28), per-call catches that fall back to "no face tracking"
(frameProcessor.ts:282-288), camera errors surfaced to the user
(camera.ts:25-28).  The serving equivalents here:

* `HealthMonitor` tracks consecutive step failures; past a threshold the
  engine enters DEGRADED and serves passthrough frames (input == output)
  rather than crashing the batch -- the moral equivalent of the WASM
  fallback chain;
* per-stream error slots let one poisoned stream be reset/evicted without
  touching the other S-1 (stream re-admission, SURVEY.md §5).
"""

from __future__ import annotations

import enum
import logging
import time

log = logging.getLogger("vst.health")


class EngineHealth(enum.Enum):
    OK = "ok"
    DEGRADED = "degraded"  # serving passthrough
    DOWN = "down"


class HealthMonitor:
    def __init__(self, max_consecutive_failures: int = 3, recovery_probe_s: float = 5.0):
        self.max_consecutive_failures = max_consecutive_failures
        self.recovery_probe_s = recovery_probe_s
        self.state = EngineHealth.OK
        self.consecutive_failures = 0
        self.total_failures = 0
        self.last_error: str | None = None
        self._degraded_at = 0.0

    def record_success(self):
        self.consecutive_failures = 0
        if self.state is EngineHealth.DEGRADED:
            log.info("engine recovered; leaving degraded mode")
        self.state = EngineHealth.OK

    def record_failure(self, err: BaseException):
        self.consecutive_failures += 1
        self.total_failures += 1
        self.last_error = f"{type(err).__name__}: {err}"
        log.warning("pipeline step failed (%d consecutive): %s",
                    self.consecutive_failures, self.last_error)
        if self.consecutive_failures >= self.max_consecutive_failures:
            if self.state is not EngineHealth.DEGRADED:
                log.error("entering DEGRADED (passthrough) mode")
            self.state = EngineHealth.DEGRADED
            self._degraded_at = time.monotonic()

    @property
    def should_probe(self) -> bool:
        """In DEGRADED mode, retry the real pipeline occasionally."""
        return (
            self.state is EngineHealth.DEGRADED
            and time.monotonic() - self._degraded_at >= self.recovery_probe_s
        )

    def snapshot(self) -> dict:
        return {
            "state": self.state.value,
            "consecutive_failures": self.consecutive_failures,
            "total_failures": self.total_failures,
            "last_error": self.last_error,
        }
