"""Cron-style scheduled batch monitors.

Reference shape (`scheduler/base.py:1-120`): a Scheduler thread computes
each Job's next triggering times from its cron expression + timezone, sleeps
until the earliest, runs the due jobs (worker pool capped at MAX_WORKERS=3),
and supports three delayed policies — SKIP missed firings, collapse them to
ONCE, or run them ALL.

No external cron library is available in this environment, so the 5-field
cron expression parser below is a minimal re-derivation (minute, hour,
day-of-month, month, day-of-week; ``*``, lists, ranges, ``*/step``).
"""

from __future__ import annotations

import datetime as _dt
import threading
from dataclasses import dataclass, field
from enum import Enum, auto
from typing import Callable, Iterable

MAX_WORKERS = 3


class DelayedPolicy(Enum):
    SKIP = auto()
    ONCE = auto()
    ALL = auto()


def _parse_field(spec: str, lo: int, hi: int) -> set[int]:
    vals: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
        # steps anchor at the RANGE start (standard cron: '12-30/5' on
        # minutes → 12,17,22,27), not the field minimum
        if part in ("*", ""):
            rng_lo, rng_hi = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            rng_lo, rng_hi = int(a), int(b)
        else:
            rng_lo = rng_hi = int(part)
        vals.update(v for v in range(rng_lo, rng_hi + 1)
                    if (v - rng_lo) % step == 0)
    return {v for v in vals if lo <= v <= hi}


class Cron:
    """minute hour day-of-month month day-of-week (0=Sunday, like cron)."""

    def __init__(self, expr: str):
        f = expr.split()
        if len(f) != 5:
            raise ValueError(f"need 5 cron fields, got {expr!r}")
        self.minutes = _parse_field(f[0], 0, 59)
        self.hours = _parse_field(f[1], 0, 23)
        self.dom = _parse_field(f[2], 1, 31)
        self.months = _parse_field(f[3], 1, 12)
        # standard cron accepts both 0 and 7 for Sunday; normalize 7 -> 0
        self.dow = {0 if v == 7 else v for v in _parse_field(f[4], 0, 7)}
        # standard cron (and the cron_converter the reference uses) ORs the
        # two day fields when BOTH are restricted; AND otherwise
        self._dom_any = f[2].strip() == "*"
        self._dow_any = f[4].strip() == "*"

    def matches(self, t: _dt.datetime) -> bool:
        dom_ok = t.day in self.dom
        dow_ok = (t.weekday() + 1) % 7 in self.dow
        if self._dom_any or self._dow_any:
            day_ok = dom_ok and dow_ok
        else:
            day_ok = dom_ok or dow_ok
        return (t.minute in self.minutes and t.hour in self.hours
                and day_ok and t.month in self.months)

    def next_after(self, t: _dt.datetime) -> _dt.datetime:
        """First matching minute strictly after ``t`` (bounded scan)."""
        cur = t.replace(second=0, microsecond=0) + _dt.timedelta(minutes=1)
        for _ in range(366 * 24 * 60):
            if self.matches(cur):
                return cur
            cur += _dt.timedelta(minutes=1)
        raise ValueError("no cron match within a year")

    def schedule(self, base: _dt.datetime):
        cur = base
        while True:
            cur = self.next_after(cur)
            yield cur


@dataclass
class Job:
    cron_expr: str
    func: Callable[[], None]
    name: str = ""
    delayed_policy: DelayedPolicy = DelayedPolicy.SKIP
    kwargs: dict = field(default_factory=dict)

    def get_triggering_times(self, base_time: _dt.datetime):
        return Cron(self.cron_expr).schedule(base_time)


class Scheduler:
    """scheduler/base.py Scheduler: thread loop + bounded worker pool."""

    def __init__(self, jobs: Iterable[Job] = (), now: Callable | None = None):
        self._jobs = list(jobs)
        self._stopping = threading.Event()
        self._workers = threading.Semaphore(MAX_WORKERS)
        self.thread: threading.Thread | None = None
        self._now = now or (lambda: _dt.datetime.now(_dt.timezone.utc))
        self.runs: list[tuple[str, _dt.datetime]] = []

    def get_jobs(self) -> Iterable[Job]:
        return self._jobs

    def add_job(self, job: Job) -> None:
        self._jobs.append(job)

    def start_job(self, job: Job, triggering_time: _dt.datetime) -> None:
        def _run():
            try:
                job.func(**job.kwargs)
            finally:
                self._workers.release()

        self._workers.acquire()
        self.runs.append((job.name or job.cron_expr, triggering_time))
        t = threading.Thread(target=_run, daemon=True)
        t.start()

    def run_pending(self, base_time: _dt.datetime,
                    until: _dt.datetime,
                    current_within: _dt.timedelta = _dt.timedelta(minutes=1),
                    ) -> int:
        """One synchronous sweep [base_time, until] — fire every due
        triggering time per job, honoring the delayed policy. The threaded
        ``start()`` loop wraps this; it is also the unit-testable surface.

        Policies (scheduler/base.py:94-98): ALL fires every missed trigger;
        ONCE collapses missed triggers into one run (attributed to the
        earliest); SKIP drops missed triggers entirely — only times still
        current relative to ``until`` (within ``current_within``, the poll
        window) fire, so a job that stalled past its slot stays silent
        until the next on-time trigger, matching the reference's
        ``triggering_time >= now`` gate."""
        fired = 0
        for job in self.get_jobs():
            gen = job.get_triggering_times(base_time)
            due = []
            for t in gen:
                if t > until:
                    break
                due.append(t)
            if not due:
                continue
            if job.delayed_policy is DelayedPolicy.SKIP:
                due = [t for t in due if until - t <= current_within]
            elif job.delayed_policy is DelayedPolicy.ONCE:
                due = due[:1]
            for t in due:
                self.start_job(job, t)
                fired += 1
        return fired

    def start(self, base_time: _dt.datetime | None = None,
              poll_seconds: float = 30.0):
        if self.thread:
            raise RuntimeError("The scheduler can be started only once")
        base = base_time or self._now()

        def _loop():
            last = base
            while not self._stopping.is_set():
                now = self._now()
                self.run_pending(last, now)
                last = now
                self._stopping.wait(poll_seconds)

        self.thread = threading.Thread(target=_loop, daemon=True)
        self.thread.start()

    def shutdown(self):
        self._stopping.set()

    def wait(self, timeout: float | None = None):
        if self.thread:
            self.thread.join(timeout=timeout)
