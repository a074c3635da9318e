"""Stage orchestrator: the reference's PL_Master control flow
(SURVEY.md §3 entry point 1) as driver code.

Reference semantics reproduced:
- sequential ExecutePipeline chain, stop on first failure
  (PL_Master.json:8-68, ``dependsOn: Succeeded``)
- per-activity retry with interval (``retry: 2,
  retryIntervalInSeconds: 30/60`` — PL_Ingest_Bronze.json:11-15)
- per-activity timeout (10 min lookup / 1 h copy+dataflow)
- failure alerting hook (documented Logic-App webhook,
  docs/technical_report.md:344-369 — absent from the reference's
  actual JSON, SURVEY.md §2.12 C6; here a real callable hook)
"""

from __future__ import annotations

import time
import traceback
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class Stage:
    name: str
    fn: Callable[[], object]
    retries: int = 2
    retry_interval_s: float = 1.0
    # Soft, per-attempt deadline: a completed fn() is ALWAYS a success
    # (side-effectful stages are never re-run because they were slow);
    # an attempt that finished over budget is recorded in
    # PipelineResult.overruns for the operator to alert on.
    timeout_s: float | None = None


@dataclass
class PipelineResult:
    succeeded: list[str] = field(default_factory=list)
    failed: str | None = None
    error: str | None = None
    outputs: dict[str, object] = field(default_factory=dict)
    durations: dict[str, float] = field(default_factory=dict)
    overruns: dict[str, float] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return self.failed is None


def run_pipeline(
    stages: list[Stage],
    on_failure: Callable[[dict], None] | None = None,
) -> PipelineResult:
    """Run stages sequentially; stop on first (post-retry) failure.

    ``on_failure`` receives the reference's alert payload shape
    ``{message, pipeline, stage, timestamp}``
    (docs/technical_report.md:352-358).
    """
    result = PipelineResult()
    for stage in stages:
        attempt = 0
        while True:
            t0 = time.time()  # per-attempt clock: retries start fresh
            try:
                out = stage.fn()
                elapsed = time.time() - t0
                if stage.timeout_s is not None and elapsed > stage.timeout_s:
                    result.overruns[stage.name] = round(elapsed, 3)
                result.succeeded.append(stage.name)
                result.outputs[stage.name] = out
                result.durations[stage.name] = round(elapsed, 3)
                break
            except Exception as exc:  # noqa: BLE001 — orchestrator boundary
                attempt += 1
                if attempt <= stage.retries:
                    time.sleep(stage.retry_interval_s)
                    continue
                result.failed = stage.name
                result.error = f"{exc}\n{traceback.format_exc()}"
                if on_failure is not None:
                    on_failure(
                        {
                            "message": str(exc),
                            "pipeline": "run_pipeline",
                            "stage": stage.name,
                            "timestamp": time.strftime(
                                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                            ),
                        }
                    )
                return result
    return result
