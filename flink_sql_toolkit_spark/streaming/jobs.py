"""Streaming job registry (SHOW JOBS / STOP JOB surface).

Maps the reference's JobManager view (src/jobsProvider.ts:91-127,
PATCH /jobs/{id}?mode=cancel — src/flinkClient.ts:174-188) onto
``spark.streams``: every continuous ``INSERT INTO`` becomes a named
``StreamingQuery``; ``query.id`` is the jobID; ``stop()`` is the
cancel (checkpoint ≙ savepoint).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field


@dataclass
class JobInfo:
    job_id: str
    name: str
    query: object  # StreamingQuery
    start_time: dt.datetime = field(default_factory=lambda: dt.datetime.now(dt.timezone.utc))
    # the Spark checkpointLocation IS the job's savepoint (SURVEY
    # §2.1): STOP JOB … WITH SAVEPOINT returns it, and SET
    # 'execution.savepoint.path' = <it> resumes the statement from
    # that state (Flink's own resume mechanism, docs "Savepoints §
    # Resuming from Savepoints" / FLIP-147 stop-with-savepoint)
    checkpoint: str | None = None

    @property
    def status(self) -> str:
        try:
            if self.query.isActive:
                return "RUNNING"
            return "FAILED" if self.query.exception() else "FINISHED"
        except Exception:  # noqa: BLE001
            return "FINISHED"


class JobRegistry:
    def __init__(self) -> None:
        self._jobs: dict[str, JobInfo] = {}

    def register(self, query, name: str, checkpoint: str | None = None) -> JobInfo:
        info = JobInfo(
            job_id=str(query.id), name=name, query=query, checkpoint=checkpoint
        )
        self._jobs[info.job_id] = info
        return info

    def list(self) -> list[JobInfo]:
        return list(self._jobs.values())

    def get(self, job_id: str) -> JobInfo | None:
        return self._jobs.get(job_id)

    def detail(self, job_id: str) -> dict:
        """Job detail — the reference's GET /jobs/{id} fetch
        (src/flinkClient.ts:241-267) mapped onto the query's progress
        metadata: throughput/duration/state metrics come from
        ``StreamingQueryProgress`` instead of Flink job vertices."""
        info = self._jobs.get(job_id)
        if info is None:
            raise LookupError(f"job '{job_id}' not found")
        progress = None
        exception = None
        try:
            progress = info.query.lastProgress
            exception = info.query.exception()
        except Exception:  # noqa: BLE001 — a torn-down query has neither
            pass
        return {
            "jobID": info.job_id,
            "name": info.name,
            "status": info.status,
            "startTime": info.start_time.isoformat(),
            "lastProgress": progress,
            "exception": str(exception) if exception else None,
        }

    def stop(self, job_id: str) -> bool:
        """Idempotent stop (reference tolerates FINISHED/CANCELED —
        src/flinkClient.ts:269-296)."""
        info = self._jobs.get(job_id)
        if info is None:
            raise LookupError(f"job '{job_id}' not found")
        try:
            if info.query.isActive:
                info.query.stop()
                return True
        except Exception:  # noqa: BLE001
            pass
        return False
