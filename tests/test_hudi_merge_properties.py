"""Property-based differential test for the MOR log-replay merge
(`hudi_mor._merge_events`): random interleavings of data records and
ordering-valued deletes across commits, replayed through REAL encoded
HoodieLogFormat files, must equal an independent reference model of
DefaultHoodieRecordPayload semantics (greater ordering value wins,
ties to the later event, null ordering falls back to arrival order).

Pure-Python (no Spark): _merge_events reads log files directly, so the
property runs hundreds of cases in seconds — the differential layer
for the r15 ordering-valued delete blocks.
"""

from __future__ import annotations

import json
import os

from hypothesis import given, settings
from hypothesis import strategies as st

from sparkstreamingtwitter_presidential_spark.sources import hudi_log as hl
from sparkstreamingtwitter_presidential_spark.sources.hudi_mor import (
    _merge_events,
)

_DATA_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "_hoodie_record_key", "type": "string"},
        {"name": "v", "type": ["null", "long"]},
        {"name": "payload", "type": "string"},
    ],
}
_DEL_SCHEMA = hl.delete_block_schema(["null", "long"])

_KEYS = ["k0", "k1", "k2"]
_op = st.tuples(
    st.sampled_from(["put", "del"]),
    st.sampled_from(_KEYS),
    st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
)
# a commit = non-empty list of ops; a history = 1..5 commits
_history = st.lists(
    st.lists(_op, min_size=1, max_size=4), min_size=1, max_size=5
)


def _reference(commits):
    """Independent model of DefaultHoodieRecordPayload replay: state is
    key -> (kind, ordering, payload). An incoming event loses ONLY when
    both orderings are non-null and the incoming one is strictly
    lower; otherwise it wins (ties and nulls -> later event wins)."""
    state: dict[str, tuple[str, object, str | None]] = {}
    for ci, ops in enumerate(commits):
        for kind, key, ov in ops:
            cur = state.get(key)
            if (
                cur is not None
                and cur[1] is not None
                and ov is not None
                and ov < cur[1]
            ):
                continue
            payload = f"c{ci}:{kind}:{key}:{ov}" if kind == "put" else None
            state[key] = (kind, ov, payload)
    return {
        k: (ov, payload)
        for k, (kind, ov, payload) in state.items()
        if kind == "put"
    }


def _write_history(tmp_path, commits):
    logs = []
    for ci, ops in enumerate(commits):
        inst = f"2026010100000{ci:04d}"
        blocks = []
        # preserve op order within the commit: one block per op (the
        # reader replays blocks in file order)
        for kind, key, ov in ops:
            if kind == "put":
                blocks.append(
                    hl.encode_block(
                        hl.AVRO_DATA_BLOCK,
                        {
                            hl.INSTANT_TIME: inst,
                            hl.SCHEMA: json.dumps(_DATA_SCHEMA),
                        },
                        hl.encode_data_block_content(
                            [
                                {
                                    "_hoodie_record_key": key,
                                    "v": ov,
                                    "payload": f"c{ci}:{kind}:{key}:{ov}",
                                }
                            ],
                            _DATA_SCHEMA,
                        ),
                    )
                )
            else:
                blocks.append(
                    hl.encode_block(
                        hl.DELETE_BLOCK,
                        {
                            hl.INSTANT_TIME: inst,
                            hl.SCHEMA: json.dumps(_DEL_SCHEMA),
                        },
                        hl.encode_delete_block_content(
                            [(key, "", ov)], schema=_DEL_SCHEMA
                        ),
                    )
                )
        name = hl.log_file_name("fid", "100", ci + 1)
        full = os.path.join(tmp_path, f"{ci}_{name}")
        hl.write_log_file(full, blocks)
        logs.append((full, inst))
    return logs


@settings(max_examples=200, deadline=None)
@given(_history)
def test_ordering_merge_matches_reference_model(tmp_path_factory, commits):
    tmp = tmp_path_factory.mktemp("hist")
    logs = _write_history(str(tmp), commits)
    events = _merge_events(logs, precombine="v")
    got = {
        k: (row["v"], row["payload"])
        for k, row in events.items()
        if row is not None and "__hoodie_delete__" not in row
    }
    assert got == _reference(commits)


@settings(max_examples=100, deadline=None)
@given(_history)
def test_commit_order_merge_matches_last_write(tmp_path_factory, commits):
    """precombine=None: plain last-write-wins replay — deletes always
    tombstone, later data always supersedes (ordering values along for
    the ride change nothing)."""
    tmp = tmp_path_factory.mktemp("hist")
    logs = _write_history(str(tmp), commits)
    events = _merge_events(logs, precombine=None)
    got = {
        k: row["payload"]
        for k, row in events.items()
        if row is not None
    }
    state: dict[str, str | None] = {}
    for ci, ops in enumerate(commits):
        for kind, key, ov in ops:
            state[key] = (
                f"c{ci}:{kind}:{key}:{ov}" if kind == "put" else None
            )
    want = {k: p for k, p in state.items() if p is not None}
    assert got == want
