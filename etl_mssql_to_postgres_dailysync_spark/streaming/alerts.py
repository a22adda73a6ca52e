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

import json
import logging
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class Alert:
    kind: str  # "failure" | "stalled" | "progress"
    query_id: str
    detail: str


# ---------------------------------------------------------------------------
# Transports — the delivery half of the reference's alerting surface
# (``email_on_failure`` + ``ALERT_EMAIL_RECIPIENTS`` env parsing,
# dags/mssql_to_postgresql_orders_daily.py:68-75,136-140). Each transport is
# a callable ``(Alert) -> None`` suitable for ``AlertingListener.on_alert``;
# compose several with :func:`fan_out`.
# ---------------------------------------------------------------------------


def format_alert_message(alert: Alert, *, job_name: str = "spark-sync") -> tuple[str, str]:
    """(subject, body) with the fields the reference's failure e-mail carries:
    job/dag name, failing unit id, and the error detail. Kept as a pure
    function so every transport (log, file, SMTP) renders identically."""
    subject = f"[{job_name}] {alert.kind.upper()}: query {alert.query_id}"
    body = (
        f"Job: {job_name}\n"
        f"Kind: {alert.kind}\n"
        f"Query: {alert.query_id}\n"
        f"Detail: {alert.detail}\n"
    )
    return subject, body


class LogTransport:
    """Deliver alerts to a standard :mod:`logging` logger (ERROR for
    failures, WARNING otherwise) — the minimal always-available stand-in for
    the reference's e-mail hook."""

    def __init__(self, logger: logging.Logger | None = None, *, job_name: str = "spark-sync"):
        self.logger = logger or logging.getLogger("spark_graft.alerts")
        self.job_name = job_name

    def __call__(self, alert: Alert) -> None:
        subject, body = format_alert_message(alert, job_name=self.job_name)
        level = logging.ERROR if alert.kind == "failure" else logging.WARNING
        self.logger.log(level, "%s\n%s", subject, body)


class FileTransport:
    """Append one JSON line per alert to ``path`` — a durable, tail-able
    alert log (the deployment shape: a sidecar ships this file to the real
    pager/mail system)."""

    def __init__(self, path: str, *, job_name: str = "spark-sync"):
        self.path = path
        self.job_name = job_name

    def __call__(self, alert: Alert) -> None:
        subject, _ = format_alert_message(alert, job_name=self.job_name)
        rec = {
            "ts": time.time(),
            "job": self.job_name,
            "kind": alert.kind,
            "query_id": alert.query_id,
            "detail": alert.detail,
            "subject": subject,
        }
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(rec) + "\n")


class SmtpTransport:
    """SMTP delivery matching the reference's ``email_on_failure`` contract:
    recipients parsed from a comma-separated string with the same minimal
    ``'@' in addr`` validity filter (dags/…_orders_daily.py:69-70). The
    send itself needs a live SMTP host, so ``send_fn`` is injectable; the
    default uses :mod:`smtplib` at call time."""

    def __init__(self, recipients: str | list[str], *, host: str = "localhost",
                 port: int = 25, sender: str = "noreply@spark-sync",
                 job_name: str = "spark-sync",
                 send_fn: Callable[[str, list[str], str], None] | None = None):
        if isinstance(recipients, str):
            recipients = [r.strip() for r in recipients.split(",") if r.strip() and "@" in r]
        self.recipients = list(recipients)
        self.host, self.port, self.sender = host, port, sender
        self.job_name = job_name
        self._send_fn = send_fn

    def _default_send(self, sender: str, recipients: list[str], message: str) -> None:
        import smtplib

        with smtplib.SMTP(self.host, self.port) as s:
            s.sendmail(sender, recipients, message)

    def __call__(self, alert: Alert) -> None:
        if not self.recipients:  # reference: no valid recipients -> no mail
            return
        subject, body = format_alert_message(alert, job_name=self.job_name)
        message = (
            f"From: {self.sender}\r\nTo: {', '.join(self.recipients)}\r\n"
            f"Subject: {subject}\r\n\r\n{body}"
        )
        (self._send_fn or self._default_send)(self.sender, self.recipients, message)


def fan_out(*transports: Callable[[Alert], None]) -> Callable[[Alert], None]:
    """Compose transports; a transport that raises does not block the rest
    (delivery failure must never take down the stream — the listener runs
    on Spark's event bus)."""

    def _send(alert: Alert) -> None:
        for t in transports:
            try:
                t(alert)
            except Exception:  # noqa: BLE001 — alerting must not propagate
                logging.getLogger("spark_graft.alerts").exception(
                    "alert transport %r failed", t
                )

    return _send


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
