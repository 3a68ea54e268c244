"""_delta_log file naming (reference: internal/util/filenames/filename.go)."""

from __future__ import annotations

import os
import re

DELTA_FILE_RE = re.compile(r"^(\d{20})\.json$")
CHECKPOINT_FILE_RE = re.compile(
    r"^(\d{20})\.checkpoint(\.(\d{10})\.(\d{10}))?\.parquet$"
)
LAST_CHECKPOINT = "_last_checkpoint"


def delta_file(log_path: str, version: int) -> str:
    """%020d.json (reference: filename.go:17-19)."""
    return os.path.join(log_path, f"{version:020d}.json")


def checkpoint_file_single(log_path: str, version: int) -> str:
    """%020d.checkpoint.parquet (reference: filename.go:69-71)."""
    return os.path.join(log_path, f"{version:020d}.checkpoint.parquet")


def checkpoint_file_parts(log_path: str, version: int, parts: int) -> list[str]:
    """Multi-part %020d.checkpoint.%010d.%010d.parquet
    (reference: filename.go:73-79)."""
    return [
        os.path.join(log_path, f"{version:020d}.checkpoint.{i + 1:010d}.{parts:010d}.parquet")
        for i in range(parts)
    ]


def is_delta_file(path: str) -> bool:
    return DELTA_FILE_RE.match(os.path.basename(path)) is not None


def is_checkpoint_file(path: str) -> bool:
    return CHECKPOINT_FILE_RE.match(os.path.basename(path)) is not None


def delta_version(path: str) -> int:
    m = DELTA_FILE_RE.match(os.path.basename(path))
    if not m:
        raise ValueError(f"not a delta file: {path}")
    return int(m.group(1))


def checkpoint_version(path: str) -> int:
    m = CHECKPOINT_FILE_RE.match(os.path.basename(path))
    if not m:
        raise ValueError(f"not a checkpoint file: {path}")
    return int(m.group(1))


def checkpoint_part(path: str) -> tuple[int | None, int | None]:
    """(part_number, total_parts) or (None, None) for single-file."""
    m = CHECKPOINT_FILE_RE.match(os.path.basename(path))
    if not m:
        raise ValueError(f"not a checkpoint file: {path}")
    if m.group(3) is None:
        return None, None
    return int(m.group(3)), int(m.group(4))


def checkpoint_prefix(log_path: str, version: int) -> str:
    """Listing start anchor: files >= this name cover the checkpoint and all
    later deltas (reference: filename.go / checkpoint listing)."""
    return os.path.join(log_path, f"{version:020d}")
