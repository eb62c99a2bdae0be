"""Elasticsearch date-math parser (driver-side, plan time only).

The reference accepts config dates as ISO-8601, epoch-ms, or ES date-math
strings like ``now-1h/h`` (datemath dependency declared at
/root/reference/asset/package.json:18; validation at
/root/reference/asset/elasticsearch_reader/index.js:59-96). Supported here:

    now | <ISO8601> [||] ( (+|-) N (y|M|w|d|h|m|s|ms) )* ( / unit )?

Rounding ``/unit`` truncates down to the unit start (like ES).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

_STEP_RE = re.compile(r"([+-])(\d+)(ms|[yMwdhms])")

_UNIT_TD = {
    "w": lambda n: timedelta(weeks=n),
    "d": lambda n: timedelta(days=n),
    "h": lambda n: timedelta(hours=n),
    "m": lambda n: timedelta(minutes=n),
    "s": lambda n: timedelta(seconds=n),
    "ms": lambda n: timedelta(milliseconds=n),
}


def _add_months(dt: datetime, n: int) -> datetime:
    m0 = dt.month - 1 + n
    year = dt.year + m0 // 12
    month = m0 % 12 + 1
    day = min(dt.day, [31, 29 if year % 4 == 0 and (year % 100 != 0 or year % 400 == 0) else 28,
                       31, 30, 31, 30, 31, 31, 30, 31, 30, 31][month - 1])
    return dt.replace(year=year, month=month, day=day)


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "y":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "M":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "w":  # ISO week start (Monday), like ES
        start = dt - timedelta(days=dt.weekday())
        return start.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "d":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "h":
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "m":
        return dt.replace(second=0, microsecond=0)
    if unit == "s":
        return dt.replace(microsecond=0)
    if unit == "ms":
        return dt.replace(microsecond=(dt.microsecond // 1000) * 1000)
    raise ValueError(f"unknown rounding unit {unit!r}")


def parse_date_math(expr: str, now: datetime | None = None) -> datetime:
    """Parse an ES date-math string to a UTC datetime."""
    now = now or datetime.now(timezone.utc)
    if now.tzinfo is None:
        now = now.replace(tzinfo=timezone.utc)
    expr = expr.strip()
    if isinstance(expr, (int, float)):
        return datetime.fromtimestamp(expr / 1000.0, tz=timezone.utc)
    if re.fullmatch(r"\d{13}", expr):
        return datetime.fromtimestamp(int(expr) / 1000.0, tz=timezone.utc)
    if expr.startswith("now"):
        anchor, rest = now, expr[3:]
    elif "||" in expr:
        iso, rest = expr.split("||", 1)
        anchor = _parse_iso(iso)
    else:
        return _parse_iso(expr)
    # apply +/- steps, then optional /round
    round_unit = None
    if "/" in rest:
        rest, round_unit = rest.rsplit("/", 1)
    pos = 0
    for m in _STEP_RE.finditer(rest):
        if m.start() != pos:
            raise ValueError(f"bad date math {expr!r}")
        pos = m.end()
        sign = 1 if m.group(1) == "+" else -1
        n, unit = int(m.group(2)), m.group(3)
        if unit == "y":
            anchor = _add_months(anchor, sign * 12 * n)
        elif unit == "M":
            anchor = _add_months(anchor, sign * n)
        else:
            anchor = anchor + _UNIT_TD[unit](sign * n)
    if pos != len(rest):
        raise ValueError(f"bad date math {expr!r}")
    if round_unit:
        anchor = _round_down(anchor, round_unit)
    return anchor


def _parse_iso(s: str) -> datetime:
    s = s.strip()
    if s.endswith("Z"):
        s = s[:-1] + "+00:00"
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt
