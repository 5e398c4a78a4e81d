"""Durable high-water marks for Python DataSource stream readers.

The Python DataSource streaming protocol gives a FRESH reader no
restore signal on a clean restart (last batch committed): Spark calls
``latestOffset()`` first — before ``initialOffset()`` or any
``partitions()`` — so a reader whose admission control counts from an
in-memory zero would return an offset BEHIND the checkpoint, move the
offset log backward, and re-deliver data (duplicates). Persisting the
reader's high-water mark in a caller-supplied ``progress_dir`` (the
query's checkpoint dir is natural) closes the gap: offsets are monotone
across restarts and admission caps stay engaged from the first batch.

The mark is a tiny JSON file written atomically (tmp + rename) on every
commit — one driver-side write per micro-batch, metadata-sized. On a
cluster, ``progress_dir`` is any shared filesystem path, exactly like
checkpointLocation.
"""

from __future__ import annotations

import json
import os


def load_high_water(progress_dir: str | None, name: str) -> int | None:
    """The persisted mark, or None when ``progress_dir`` is unset.
    A set-but-empty dir (genuine cold start) loads as 0."""
    if not progress_dir:
        return None
    path = os.path.join(progress_dir, f"{name}-highwater.json")
    try:
        with open(path, encoding="utf-8") as fh:
            return int(json.load(fh)["v"])
    except (OSError, ValueError, KeyError):
        os.makedirs(progress_dir, exist_ok=True)
        return 0


def save_high_water(progress_dir: str | None, name: str, value: int) -> None:
    if not progress_dir:
        return
    os.makedirs(progress_dir, exist_ok=True)
    path = os.path.join(progress_dir, f"{name}-highwater.json")
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump({"v": value}, fh)
    os.replace(tmp, path)  # atomic on POSIX
