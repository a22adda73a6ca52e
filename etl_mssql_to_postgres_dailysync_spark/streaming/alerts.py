"""Alerting hooks for streaming jobs — the engine-side equivalent of the
reference's Airflow failure surface (``default_args`` retries/alerting and
task-failure callbacks, dags/mssql_to_postgresql_orders_daily.py:136-137):
a ``StreamingQueryListener`` that turns query lifecycle events into
structured alert records and user callbacks.

Spark-first design: the listener runs driver-side on the engine's own event
bus (no polling thread, no log scraping), so it sees every micro-batch's
progress (rows/sec, batch duration, watermark) and the terminal event with
its exception. Alert delivery is a plain callback — wire it to email/
PagerDuty/Slack in deployment; tests assert against the recorded structs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class Alert:
    kind: str  # "failure" | "stalled" | "progress"
    query_id: str
    detail: str


@dataclass
class AlertingListener(StreamingQueryListener):
    """Records progress and raises alerts on failure or zero-input batches.

    * every progress event is kept (numInputRows, batchDuration) — the
      metrics XCom the reference pushes per task;
    * ``stall_after`` consecutive zero-row batches -> one "stalled" alert
      (the silent-upstream failure a daily-sync job otherwise misses);
    * termination with an exception -> "failure" alert with the message.
    """

    on_alert: Callable[[Alert], None] | None = None
    stall_after: int = 3
    progress: list = field(default_factory=list)
    alerts: list = field(default_factory=list)
    _zero_streak: int = 0

    def _emit(self, alert: Alert) -> None:
        self.alerts.append(alert)
        if self.on_alert is not None:
            self.on_alert(alert)

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.progress.append(
            {
                "id": str(p.id),
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "durationMs": dict(p.durationMs or {}),
            }
        )
        if p.numInputRows == 0:
            self._zero_streak += 1
            if self._zero_streak == self.stall_after:
                self._emit(
                    Alert("stalled", str(p.id), f"{self.stall_after} empty batches")
                )
        else:
            self._zero_streak = 0

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        if event.exception is not None:
            self._emit(Alert("failure", str(event.id), str(event.exception)))
