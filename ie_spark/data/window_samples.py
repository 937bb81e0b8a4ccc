"""Planted maintenance-window intervals for the interval-join oracle.

The events corpus spans January 2024 at every SF but carries no interval
table of its own, so the range-join query needs planted windows to be
non-vacuous (same pattern as lang/line/markup/url samples: BOTH engines
consume these rows, rendered from the same Python constants).

24 deterministic 90-minute windows, one per day of 2024-01-01..24, with
the start hour stepping 7 hours per day so windows sweep the full clock.
"""

from __future__ import annotations

from datetime import datetime, timedelta

MAINT_WINDOWS: list[tuple[str, str, str]] = []
for _i in range(24):
    _start = datetime(2024, 1, 1 + _i, (_i * 7) % 24, 0, 0)
    _end = _start + timedelta(minutes=90)
    MAINT_WINDOWS.append(
        (f"w{_i:02d}",
         _start.strftime("%Y-%m-%d %H:%M:%S"),
         _end.strftime("%Y-%m-%d %H:%M:%S")))
