"""ETL orchestration surface: file triggers with constraints, the
inbox -> work -> dated-archive workflow, and scheduled events.

Reference semantics being served:
  * constraint predicates prefix/suffix/regex/contains/equals with
    ignoreCase (etl:triggers/Constraint.scala:7-66); a trigger accepts a
    file iff ALL its constraints match (etl:triggers/FileTrigger.scala:20)
  * per-file script execution with work.file.base/name/path/size and
    work.path bound into the scope
    (etl:actors/WorkflowManagementActor.scala:27-38)
  * inbox -> work/<pid> -> archive/yyyy/mm/dd/hhmmss/<name> bookkeeping
    (etl:actors/FileManagementActor.scala:62-125)
  * scheduled events: times ["8:15","20:15"] firing a script daily at
    hh:mm[:ss], next-run rolls to tomorrow when the time has passed
    (etl:events/ScheduledEvent.scala:25-47,50-75)

Spark-first restatement: the trigger scripts are ScriptEngine scripts
(Catalyst-compiled SELECT/INSERT/UPSERT statements); polling replaces
the actor system + NIO watch (a cluster deployment drives poll_once /
tick from its own scheduler or a Structured-Streaming file source).
The clock is injectable everywhere for deterministic tests.
"""

from __future__ import annotations

import datetime as _dt
import os
import re
import shutil
from dataclasses import dataclass, field


# ---------------- constraints (etl:triggers/Constraint.scala) ----------
def make_constraint(spec: dict):
    """One constraint spec -> predicate over a file NAME. Spec keys
    mirror the reference's JSON form: {"prefix": "company",
    "ignoreCase": true} etc. Multiple keys in one spec = one predicate
    per key, all required (ConstraintRaw.toModel flattens the same way)."""
    ignore = bool(spec.get("ignoreCase", False))

    def fold(s: str) -> str:
        return s.lower() if ignore else s

    preds = []
    if "contains" in spec:
        sub = fold(spec["contains"])
        preds.append(lambda n, sub=sub: sub in fold(n))
    if "equals" in spec:
        eq = fold(spec["equals"])
        preds.append(lambda n, eq=eq: fold(n) == eq)
    if "prefix" in spec:
        pre = fold(spec["prefix"])
        preds.append(lambda n, pre=pre: fold(n).startswith(pre))
    if "suffix" in spec:
        suf = fold(spec["suffix"])
        preds.append(lambda n, suf=suf: fold(n).endswith(suf))
    if "regex" in spec:
        # reference uses String.matches = FULL match (RegExConstraint)
        rx = re.compile(spec["regex"])
        preds.append(lambda n, rx=rx: rx.fullmatch(n) is not None)
    if not preds:
        raise ValueError(f"constraint spec has no predicate: {spec}")
    return lambda name: all(p(name) for p in preds)


@dataclass
class FileTrigger:
    """A named script fired for inbox files matching ALL constraints."""

    name: str
    constraints: list[dict]
    script: str

    def accepts(self, file_name: str) -> bool:
        return all(make_constraint(c)(file_name) for c in self.constraints)


@dataclass
class ProcessedFile:
    trigger: str
    file_name: str
    archive_path: str
    results: list = field(default_factory=list)
    error: str | None = None


class FileWorkflow:
    """inbox -> work/<pid> -> archive/yyyy/mm/dd/hhmmss runner.

    poll_once() processes every file currently in the inbox (the
    reference processes pre-existing files the same way,
    etl:actors/FileManagementActor.scala:92-97). Files matching no
    trigger stay in the inbox untouched."""

    def __init__(self, engine, inbox: str, work_dir: str, archive_dir: str,
                 triggers: list[FileTrigger], clock=None, pid: str = "0"):
        self.engine = engine
        self.inbox, self.work_dir, self.archive_dir = inbox, work_dir, archive_dir
        self.triggers = triggers
        self.clock = clock or _dt.datetime.now
        self.pid = pid
        os.makedirs(inbox, exist_ok=True)
        os.makedirs(work_dir, exist_ok=True)
        os.makedirs(archive_dir, exist_ok=True)
        # SHOW FILES (no arg) lists the inbox, as the reference does
        # (core:ops/sql/Show.scala:15-45) — bind it for trigger scripts
        self.engine.variables["inbox"] = inbox

    def _archive_target(self, name: str) -> str:
        ts = self.clock()
        return os.path.join(
            self.archive_dir, f"{ts:%Y}", f"{ts:%m}", f"{ts:%d}",
            f"{ts:%H%M%S}", name,
        )

    def poll_once(self) -> list[ProcessedFile]:
        processed: list[ProcessedFile] = []
        for name in sorted(os.listdir(self.inbox)):
            full = os.path.join(self.inbox, name)
            if not os.path.isfile(full):
                continue
            trigger = next((t for t in self.triggers if t.accepts(name)), None)
            if trigger is None:
                continue
            # claim: inbox -> work/<pid>/ (rename is atomic on one fs)
            wdir = os.path.join(self.work_dir, self.pid)
            os.makedirs(wdir, exist_ok=True)
            wfile = os.path.join(wdir, name)
            shutil.move(full, wfile)
            # bind the reference's work.* variables
            # (etl:actors/WorkflowManagementActor.scala:29-35)
            saved = dict(self.engine.variables)
            self.engine.variables.update({
                "work.file.base": os.path.splitext(name)[0],
                "work.file.name": name,
                "work.file.path": wfile,
                "work.file.size": os.path.getsize(wfile),
                "work.path": wdir,
            })
            rec = ProcessedFile(trigger=trigger.name, file_name=name, archive_path="")
            try:
                rec.results = self.engine.run_script(trigger.script)
            except Exception as e:  # per-file failure never aborts the poll
                rec.error = f"{type(e).__name__}: {e}"
            finally:
                self.engine.variables = saved
            target = self._archive_target(name)
            os.makedirs(os.path.dirname(target), exist_ok=True)
            shutil.move(wfile, target)
            rec.archive_path = target
            processed.append(rec)
        return processed


# ---------------- scheduled events (etl:events/ScheduledEvent.scala) ---
@dataclass
class ScheduledEvent:
    name: str
    times: list[str]  # ["8:15", "20:15:30"] — hh:mm[:ss]
    script: str

    def next_run_times(self, now: _dt.datetime) -> list[_dt.datetime]:
        """Next daily firing per entry: today at hh:mm[:ss], or tomorrow
        when that moment has passed (ScheduledEvent.getNextRunTime)."""
        out = []
        for s in self.times:
            parts = s.split(":")
            if len(parts) == 2:
                hh, mm, ss = int(parts[0]), int(parts[1]), 0
            elif len(parts) == 3:
                hh, mm, ss = (int(x) for x in parts)
            else:
                raise ValueError(
                    f"Invalid time value '{s}'. Expected hh:mm[:ss] format."
                )
            t = now.replace(hour=hh, minute=mm, second=ss, microsecond=0)
            if t <= now:
                t += _dt.timedelta(days=1)
            out.append(t)
        return out


class Scheduler:
    """Config-driven runner: tick(now) fires every event whose scheduled
    moment arrived since the last tick. Time is injected, never read
    from the wall clock inside, so tests drive it deterministically; a
    daemon deployment calls tick() from any loop/cron."""

    def __init__(self, engine, events: list[ScheduledEvent], start: _dt.datetime):
        self.engine = engine
        self.events = events
        # next pending firing per (event, time-entry)
        self._pending: list[tuple[_dt.datetime, ScheduledEvent]] = [
            (t, ev) for ev in events for t in ev.next_run_times(start)
        ]
        self.fired: list[tuple[_dt.datetime, str, object]] = []

    def tick(self, now: _dt.datetime) -> list[str]:
        """Fire everything due at ``now``; reschedule each firing for its
        next FUTURE occurrence (downtime longer than a day fires at most
        once, like the reference's roll-forward getNextRunTime — no
        once-per-missed-day catch-up storm). Returns names in time order."""
        # key on the timestamp only: ScheduledEvent defines no ordering,
        # and two events sharing a time must not crash the sort
        due = sorted((p for p in self._pending if p[0] <= now), key=lambda p: p[0])
        self._pending = [p for p in self._pending if p[0] > now]
        names = []
        for t, ev in due:
            try:
                result = self.engine.run_script(ev.script)
            except Exception as e:  # reference logs and carries on
                result = f"FAILED: {e}"
            self.fired.append((t, ev.name, result))
            names.append(ev.name)
            nxt = t + _dt.timedelta(days=1)
            while nxt <= now:
                nxt += _dt.timedelta(days=1)
            self._pending.append((nxt, ev))
        return names
