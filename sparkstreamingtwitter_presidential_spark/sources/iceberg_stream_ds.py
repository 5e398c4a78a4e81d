"""Native Iceberg STREAMING SOURCE (Spark 4 Python DataSource API):
``spark.readStream.format("iceberg_native").load(path)`` tails an
Iceberg table's snapshot chain — the real iceberg-spark streaming
read's contract (stream-from-timestamp/snapshot), no jars.

Offsets are SEQUENCE NUMBERS ({"seq": S} == "snapshots with
sequence-number <= S consumed") — the v2 spec's monotone commit clock
(snapshot IDs are random; sequence numbers order them). A micro-batch
plans the data files whose DATA SEQUENCE NUMBER falls in
``(start, end]`` from the range's latest manifest list (entries
select by their own sequence number with the spec's inheritance rule
— the same selection as read_iceberg_incremental, so foreign
manifest-merging writers are read correctly). One InputPartition per
data file; replays under checkpointing plan the identical slice.

Append-only contract (the real source's default): a non-append
snapshot in range (overwrite/delete) fails the stream by name —
or skips WHOLE under ``skipChangeCommits=true`` (r11, the Delta
twin's option: a change commit's files are rewrite survivors, not
appends); delete manifests with in-range content fail likewise;
``replace`` (compaction) always skips as layout-only. Schema
evolution mid-stream is conservative: a range snapshot whose schema
renames or retypes any current field refuses (field-id projection is
the batch reader's job; a stream silently NULLing a renamed column
would corrupt every downstream aggregate).

Scale/shape: planning is a driver-side metadata walk of the range's
manifests (cost ∝ the delta, never the table); reads yield ARROW
RECORD BATCHES per file with IDENTITY partition values injected as
typed constant columns (non-identity transform sources live in the
data files themselves, per the spec).

Parity: iceberg-spark's `readStream.format("iceberg")` (Iceberg docs
§Spark Structured Streaming). Reference scope note as
sources/delta_stream_ds.py.
"""

from __future__ import annotations

import os
from typing import Any, Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from sparkstreamingtwitter_presidential_spark.sources.delta_stream_ds import (
    _pa_type,
)
from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
    _STATUS_DELETED,
    _ancestor_ids,
    _avro_partition_to_python,
    _load_metadata,
    _partition_fields,
    _schema_for,
    _schema_to_spark,
    _snapshot,
    read_container,
)
from sparkstreamingtwitter_presidential_spark.sources.stream_progress import (
    load_high_water,
    save_high_water,
)


class _IceFilePartition(InputPartition):
    """One data file: absolute path, (name, ddl) for every declared
    field in schema order, and {name: python value} for the identity
    partition columns to inject (absent from the data files)."""

    def __init__(self, path: str, fields: list, inject: dict):
        self.path = path
        self.fields = fields
        self.inject = inject


class IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, options, fields: list):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("iceberg_native: .load(path) is required")
        self.fields = fields  # (name, ddl) in schema order
        if options.get("startingTimestamp") is not None:
            # real-source parity (r10): stream from the first MAIN
            # snapshot committed at-or-after the timestamp
            if options.get("startingSequence") is not None:
                raise ValueError(
                    "pass either startingSequence or startingTimestamp, "
                    "not both"
                )
            import datetime as _dt

            ts = _dt.datetime.fromisoformat(options["startingTimestamp"])
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=_dt.timezone.utc)
            want_ms = int(ts.timestamp() * 1000)
            meta = _load_metadata(self.path)
            anc = _ancestor_ids(meta, _snapshot(meta, None)["snapshot-id"])
            cands = sorted(
                (
                    s["sequence-number"]
                    for s in meta.get("snapshots", [])
                    if s["snapshot-id"] in anc
                    and int(s.get("timestamp-ms", 0)) >= want_ms
                ),
            )
            if not cands:
                raise ValueError(
                    f"startingTimestamp {options['startingTimestamp']} "
                    "is after the table's latest snapshot — nothing to "
                    "stream from"
                )
            self.starting_seq = cands[0] - 1
        else:
            self.starting_seq = int(options.get("startingSequence", "0"))
        self.max_snapshots = (
            int(options.get("maxSnapshotsPerTrigger", "0")) or None
        )
        # real-source parity (r11, the Delta twin's r10 option): skip
        # non-append snapshots WHOLE instead of failing the stream — a
        # change commit's added files are rewrite survivors / upsert
        # batches, not appends, so delivering them would double rows
        self.skip_changes = (
            str(options.get("skipChangeCommits", "false")).lower()
            == "true"
        )
        # byte-based admission (r10): cumulative added-files-size from
        # the snapshot summaries (real-writer + this engine's field);
        # summaries without it fall back to one cached manifest walk.
        # Soft max — at least one snapshot always admits.
        self.max_bytes = int(options.get("maxBytesPerTrigger", "0")) or None
        self._snap_bytes_cache: dict[int, int] = {}
        self.progress_dir = options.get("progress_dir")
        # sequence numbers are 1-based, so load_high_water's cold-start
        # 0 natively means "nothing consumed" — no count shift needed
        self._last: int | None = load_high_water(
            self.progress_dir, "iceberg_native"
        )

    def initialOffset(self) -> dict:
        return {"seq": self.starting_seq}

    def _snapshot_bytes(self, meta: dict, snap: dict) -> int:
        sid = snap["snapshot-id"]
        if sid not in self._snap_bytes_cache:
            summ = snap.get("summary") or {}
            if "added-files-size" in summ:
                self._snap_bytes_cache[sid] = int(summ["added-files-size"])
            else:
                # one cached walk of the snapshot's manifest list,
                # counting its own ADDED data entries' sizes
                total = 0
                seq = snap["sequence-number"]
                _, _, manifests = read_container(snap["manifest-list"])
                for m in manifests:
                    if m["content"] != 0 or m["sequence_number"] != seq:
                        continue
                    _, _, entries = read_container(m["manifest_path"])
                    for e in entries:
                        eseq = e.get("sequence_number")
                        if eseq is None:
                            eseq = m["sequence_number"]
                        if e["status"] != _STATUS_DELETED and eseq == seq:
                            total += int(
                                e["data_file"].get("file_size_in_bytes", 0)
                            )
                self._snap_bytes_cache[sid] = total
        return self._snap_bytes_cache[sid]

    def latestOffset(self) -> dict:
        meta = _load_metadata(self.path)
        cur = _snapshot(meta, None)
        s = cur["sequence-number"]
        if self.max_snapshots is not None and self._last is not None:
            s = min(s, self._last + self.max_snapshots)
        if self.max_bytes is not None and self._last is not None:
            anc = _ancestor_ids(meta, cur["snapshot-id"])
            cands = sorted(
                (
                    x
                    for x in meta.get("snapshots", [])
                    if self._last < x.get("sequence-number", 0) <= s
                    and x["snapshot-id"] in anc
                    # replace (compaction) snapshots deliver zero rows
                    # (partitions() skips them) — counting their bytes
                    # would stall the budget on undelivered data; under
                    # skipChangeCommits=true the same holds for EVERY
                    # skipped non-append commit (r11 advice: a trigger
                    # must not spend its byte budget on commits
                    # partitions() will skip)
                    and (x.get("summary") or {}).get("operation")
                    != "replace"
                    and not (
                        self.skip_changes
                        and (x.get("summary") or {}).get("operation")
                        not in (None, "append")
                    )
                ),
                key=lambda x: x["sequence-number"],
            )
            if cands:  # branch-only windows advance uncapped (they
                # plan no files; capping to _last would stall the
                # stream behind another branch's commits)
                admitted, total = self._last, 0
                for x in cands:
                    b = self._snapshot_bytes(meta, x)
                    if admitted > self._last and total + b > self.max_bytes:
                        break
                    admitted, total = x["sequence-number"], total + b
                s = admitted
        if self._last is not None:
            s = max(s, self._last)
        s = max(s, self.starting_seq)
        self._last = s
        return {"seq": s}

    def partitions(self, start: dict, end: dict):
        self._last = max(self._last or 0, end["seq"])
        lo_seq, hi_seq = start["seq"], end["seq"]
        if lo_seq >= hi_seq:
            return []  # empty replan tick — nothing to deliver
        meta = _load_metadata(self.path)
        # ancestry-filtered: the table-wide sequence clock also stamps
        # BRANCH commits — a main-history stream must not deliver (or
        # plan from the manifest list of) another branch's snapshot
        anc = _ancestor_ids(meta, _snapshot(meta, None)["snapshot-id"])
        snaps_in_range = [
            s
            for s in meta.get("snapshots", [])
            if lo_seq < s.get("sequence-number", 0) <= hi_seq
            and s["snapshot-id"] in anc
        ]
        if not snaps_in_range:
            if any(
                lo_seq < s.get("sequence-number", 0) <= hi_seq
                for s in meta.get("snapshots", [])
            ):
                return []  # window holds only other branches' commits
            raise ValueError(
                f"no snapshots with sequence in ({lo_seq}, {hi_seq}] "
                f"remain in {self.path} — the range was expired; "
                "restart the stream from a snapshot read"
            )
        cur_sid = meta.get("current-schema-id", 0)
        cur_schema = _schema_for(meta, cur_sid)
        cur_by_id = {f["id"]: f for f in cur_schema["fields"]}
        planned: list[dict] = []
        for s in snaps_in_range:
            op = s.get("summary", {}).get("operation")
            if op == "replace":
                # compaction/rewrite_manifests: layout-only — its rows
                # were (or will be) delivered under their ORIGINAL
                # append snapshots' sequences; planning each snapshot
                # from its OWN manifest list (r10) makes skipping safe
                # even mid-range (the real source's behavior — a
                # compacting table must not kill its consumers)
                continue
            if op not in (None, "append"):
                if self.skip_changes:
                    # skipChangeCommits=true: the commit (data files
                    # AND its delete manifests) skips whole — the
                    # consumer opted into missing row-level changes
                    continue
                raise ValueError(
                    f"snapshot {s['snapshot-id']} (seq "
                    f"{s['sequence-number']}) in the stream's range is "
                    f"a {op!r}, not an append — an append-only stream "
                    "cannot represent replaced data; restart from a "
                    "snapshot read past it (or pass "
                    "skipChangeCommits=true to skip change commits "
                    "whole)"
                )
            sid = s.get("schema-id", cur_sid)
            if sid != cur_sid:
                for f in _schema_for(meta, sid)["fields"]:
                    cf = cur_by_id.get(f["id"])
                    if cf is not None and (
                        cf["name"] != f["name"] or cf["type"] != f["type"]
                    ):
                        raise NotImplementedError(
                            f"snapshot {s['snapshot-id']} wrote field "
                            f"{f['id']} as {f['name']!r}:{f['type']!r} "
                            f"but the current schema says "
                            f"{cf['name']!r}:{cf['type']!r} — "
                            "mid-stream renames/retypes are not "
                            "supported (batch reads project by "
                            "field-id; restart the stream from a "
                            "snapshot read)"
                        )
            planned.append(s)
        # identity injection keys on each MANIFEST's own spec (r12
        # late — after partition evolution, pre-evolution appends
        # carry old-shaped tuples; injecting under the default spec
        # would read NULL partition values for them)
        default_spec = meta.get("default-spec-id", 0)
        pf_cache = {
            default_spec: _partition_fields(meta, cur_schema)
        }

        def _identity_for(m_sid: int) -> list[dict]:
            if m_sid not in pf_cache:
                pf_cache[m_sid] = _partition_fields(
                    meta, cur_schema, m_sid
                )
            return [
                pf
                for pf in pf_cache[m_sid]
                if pf["transform"] == "identity"
            ]

        out = []
        # per-snapshot planning (r10; previously one plan off the
        # range's LATEST manifest list): each append snapshot's own
        # list still carries its entries even if a LATER in-range
        # replace compacted them away — no lost rows, no refusal on
        # compacting tables. Cost stays ∝ the delta: one manifest-list
        # read per planned snapshot, entry selection by its own seq.
        for s in planned:
            sseq = s["sequence-number"]
            _, _, manifests = read_container(s["manifest-list"])
            for m in manifests:
                if m["content"] != 0:
                    if m["sequence_number"] == sseq:
                        raise ValueError(
                            f"delete manifest in the stream's range of "
                            f"{self.path} — row-level deletes are "
                            "retractions an append-only stream cannot "
                            "represent"
                        )
                    continue  # older deletes: already outside range
                if (
                    m["sequence_number"] < sseq
                    or m["min_sequence_number"] > sseq
                ):
                    continue
                _, _, entries = read_container(m["manifest_path"])
                for e in entries:
                    if e["status"] == _STATUS_DELETED:
                        continue
                    seq = e.get("sequence_number")
                    if seq is None:  # spec inheritance: the manifest's
                        seq = m["sequence_number"]
                    if seq != sseq:
                        continue
                    part = e["data_file"].get("partition") or {}
                    inject = {
                        pf["source_name"]: _avro_partition_to_python(
                            pf["result_type"], part.get(pf["name"])
                        )
                        for pf in _identity_for(
                            m.get("partition_spec_id", 0)
                        )
                    }
                    out.append(
                        _IceFilePartition(
                            e["data_file"]["file_path"], self.fields, inject
                        )
                    )
        return out

    def read(self, partition: _IceFilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        data_cols = [
            n for n, _t in partition.fields if n not in partition.inject
        ]
        pf = pq.ParquetFile(partition.path)
        for batch in pf.iter_batches(columns=data_cols):
            n = batch.num_rows
            arrays, names = [], []
            for name, ddl in partition.fields:
                if name in partition.inject:
                    arrays.append(
                        pa.array(
                            [partition.inject[name]] * n,
                            type=_pa_type(ddl),
                        )
                    )
                else:
                    arrays.append(
                        batch.column(batch.schema.names.index(name))
                    )
                names.append(name)
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    def commit(self, end: dict) -> None:
        self._last = max(self._last or 0, end["seq"])
        save_high_water(self.progress_dir, "iceberg_native", self._last)


class IcebergNativeDataSource(DataSource):
    """format("iceberg_native"): streaming reads of an Iceberg table."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_native"

    def _snapshot_fields(self) -> list:
        path = self.options.get("path")
        if not path:
            raise ValueError("iceberg_native: .load(path) is required")
        meta = _load_metadata(path)
        ice_schema = _schema_for(meta, meta.get("current-schema-id", 0))
        spark_schema = _schema_to_spark(ice_schema)
        return [
            (f.name, f.dataType.simpleString())
            for f in spark_schema.fields
        ]

    def schema(self) -> str:
        return ", ".join(f"{n} {t}" for n, t in self._snapshot_fields())

    def streamReader(self, schema: StructType) -> IcebergStreamReader:
        return IcebergStreamReader(self.options, self._snapshot_fields())

    def reader(self, schema: StructType):
        raise NotImplementedError(
            "iceberg_native is a STREAMING source; batch reads go "
            "through sources.iceberg.read_iceberg (snapshot reads "
            "with transforms/deletes/time-travel support)"
        )


def register_iceberg_stream(spark: SparkSession) -> None:
    """Idempotent registration of the streaming source on a session."""
    spark.dataSource.register(IcebergNativeDataSource)
