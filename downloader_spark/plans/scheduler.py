"""Driver-side wave scheduler: cron triggers + misfire coalescing.

Rebuild of the reference's scheduling layer (SURVEY §2.9 T1/T2):
- 5-field cron parsing/validation (reference models/schedule.py:53-63
  validates via APScheduler CronTrigger; here a self-contained parser);
- next-fire computation in UTC (service.py:96-101);
- misfire grace + coalesce=True: any number of missed fires collapses
  into ONE catch-up wave (config.py:325-341);
- schedule rows live in a table, not process memory — the wave planner
  reads them between waves (driver-side, never executor-side, matching
  the reference's "outside request context" executor wiring).

Pure Python and deterministic: given (cron, after) the next fire time
is a function, so crawl plans that embed schedules stay reproducible.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

_FIELD_RANGES = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 6)]  # min hour dom mon dow


class CronError(ValueError):
    pass


def _parse_field(spec: str, lo: int, hi: int) -> frozenset[int]:
    vals: set[int] = set()
    for part in spec.split(","):
        part = part.strip()
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            try:
                step = int(step_s)
            except ValueError:
                raise CronError(f"bad step {step_s!r}")
            if step <= 0:
                raise CronError("step must be positive")
        if part in ("*", ""):
            rng = range(lo, hi + 1, step)
        elif "-" in part:
            a, b = part.split("-", 1)
            try:
                a_i, b_i = int(a), int(b)
            except ValueError:
                raise CronError(f"bad range {part!r}")
            if not (lo <= a_i <= b_i <= hi):
                raise CronError(f"range {part!r} out of bounds {lo}-{hi}")
            rng = range(a_i, b_i + 1, step)
        else:
            try:
                v = int(part)
            except ValueError:
                raise CronError(f"bad value {part!r}")
            if not (lo <= v <= hi):
                raise CronError(f"value {v} out of bounds {lo}-{hi}")
            rng = range(v, v + 1)
        vals.update(rng)
    if not vals:
        raise CronError("empty field")
    return frozenset(vals)


@dataclass(frozen=True)
class Cron:
    minutes: frozenset[int]
    hours: frozenset[int]
    doms: frozenset[int]
    months: frozenset[int]
    dows: frozenset[int]
    dom_star: bool
    dow_star: bool

    @classmethod
    def parse(cls, expr: str) -> "Cron":
        """Validate + parse a 5-field cron string (reference bound:
        9..100 chars, models/schedule.py:34-39)."""
        if not (9 <= len(expr) <= 100):
            raise CronError("cron string must be 9..100 chars")
        fields = expr.split()
        if len(fields) != 5:
            raise CronError("cron must have 5 fields")
        parsed = [
            _parse_field(f, lo, hi) for f, (lo, hi) in zip(fields, _FIELD_RANGES)
        ]
        return cls(
            *parsed, dom_star=fields[2].startswith("*"), dow_star=fields[4].startswith("*")
        )

    def matches(self, dt: datetime) -> bool:
        if dt.minute not in self.minutes or dt.hour not in self.hours:
            return False
        if dt.month not in self.months:
            return False
        dom_ok = dt.day in self.doms
        # cron dow 0=Sunday..6=Saturday; isoweekday Mon=1..Sun=7 → %7
        dow_ok = (dt.isoweekday() % 7) in self.dows
        # standard cron OR-rule when both dom and dow are restricted
        if self.dom_star and self.dow_star:
            return True
        if self.dom_star:
            return dow_ok
        if self.dow_star:
            return dom_ok
        return dom_ok or dow_ok

    def next_fire(self, after: datetime) -> datetime:
        """First matching minute strictly after ``after`` (UTC)."""
        if after.tzinfo is None:
            after = after.replace(tzinfo=timezone.utc)
        dt = (after + timedelta(minutes=1)).replace(second=0, microsecond=0)
        for _ in range(366 * 24 * 60):  # ≤ 1 year scan; cron always fires within
            if self.matches(dt):
                return dt
            dt += timedelta(minutes=1)
        raise CronError("no fire time within a year")


@dataclass
class ScheduleState:
    schedule_id: str
    cron: str
    enabled: bool = True
    last_fire: datetime | None = None


def due_waves(
    schedules: list[ScheduleState],
    now: datetime,
    grace_seconds: int = 60,
) -> tuple[list[tuple[str, datetime]], list[tuple[str, datetime]]]:
    """Which schedules owe a wave at ``now``.

    APScheduler-equivalent semantics (reference config.py:325-341):
    - coalesce=True: any number of missed ticks collapses into ONE run
      at the LATEST missed tick;
    - misfire_grace_time: if even the latest tick is older than the
      grace window, the run is skipped and recorded as a misfire.

    Returns (due, misfired) lists of (schedule_id, fire_time).
    """
    due: list[tuple[str, datetime]] = []
    misfired: list[tuple[str, datetime]] = []
    for s in schedules:
        if not s.enabled:
            continue
        cron = Cron.parse(s.cron)
        anchor = s.last_fire or (now - timedelta(days=1))
        fire = cron.next_fire(anchor)
        latest = None
        while fire <= now:
            latest = fire
            fire = cron.next_fire(fire)
        if latest is None:
            continue
        if (now - latest).total_seconds() <= grace_seconds:
            due.append((s.schedule_id, latest))
        else:
            misfired.append((s.schedule_id, latest))
    return due, misfired
