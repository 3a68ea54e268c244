"""Table configuration keys + the `interval N unit` duration parser
(reference: config.go:43-98)."""

from __future__ import annotations

import time


class Clock:
    """Injectable clock (reference: clock.go:5-9) so tests never race
    wall time."""

    def now_millis(self) -> int:
        return int(time.time() * 1000)


class FixedClock(Clock):
    def __init__(self, millis: int):
        self.millis = millis

    def now_millis(self) -> int:
        return self.millis


_UNIT_MILLIS = {
    "nanosecond": 1e-6,
    "microsecond": 1e-3,
    "millisecond": 1,
    "second": 1000,
    "minute": 60 * 1000,
    "hour": 60 * 60 * 1000,
    "day": 24 * 60 * 60 * 1000,
    "week": 7 * 24 * 60 * 60 * 1000,
}


def parse_interval_millis(s: str) -> int:
    """Parse `interval <n> <unit>[s]` (reference: config.go:43-61)."""
    parts = s.strip().lower().split()
    if len(parts) != 3 or parts[0] != "interval":
        raise ValueError(f"couldn't parse interval: {s}")
    n = int(parts[1])
    unit = parts[2].rstrip("s") if parts[2] != "s" else parts[2]
    # normalize plural ('days' -> 'day'); 'milliseconds' -> 'millisecond'
    if unit not in _UNIT_MILLIS:
        raise ValueError(f"unknown interval unit in: {s}")
    if n < 0:
        raise ValueError(f"interval must be non-negative: {s}")
    return int(n * _UNIT_MILLIS[unit])


# Defaults (reference: config.go:63-98).
LOG_RETENTION = ("delta.logRetentionDuration", "interval 30 days")
TOMBSTONE_RETENTION = ("delta.deletedFileRetentionDuration", "interval 1 weeks")
CHECKPOINT_INTERVAL = ("delta.checkpointInterval", "10")
ENABLE_EXPIRED_LOG_CLEANUP = ("delta.enableExpiredLogCleanup", "true")
IS_APPEND_ONLY = ("delta.appendOnly", "false")
ENABLE_CHANGE_DATA_FEED = ("delta.enableChangeDataFeed", "false")


def get_millis(config: dict[str, str], key_default: tuple[str, str]) -> int:
    key, default = key_default
    return parse_interval_millis(config.get(key, default))


def get_int(config: dict[str, str], key_default: tuple[str, str]) -> int:
    key, default = key_default
    return int(config.get(key, default))


def get_bool(config: dict[str, str], key_default: tuple[str, str]) -> bool:
    key, default = key_default
    return config.get(key, default).lower() == "true"
