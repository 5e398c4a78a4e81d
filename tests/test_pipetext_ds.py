"""pipetext Python DataSource: connector read == helper read, write
roundtrip, per-file partitioning, and filter pushdown semantics."""

from __future__ import annotations

import datetime
import glob
import os

from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.sources.pipe_text import (
    read_pipe_table,
    write_pipe_table,
)
from sparkstreamingtwitter_presidential_spark.sources.pipetext_ds import (
    register_pipetext,
)

_TS = datetime.datetime(2024, 3, 1, 12, 30, 5)


def _presi(spark):
    return spark.createDataFrame(
        [
            ("bonjour le monde", 48.85, 2.35, _TS),
            ("no geo here", None, None, _TS),
            (None, 1.0, 2.0, None),
            ("third row", -33.9, 151.2, _TS),
        ],
        "text string, latitude float, longitude float, created_at timestamp",
    )


def test_connector_read_matches_helper_read(spark, tmp_path):
    register_pipetext(spark)
    path = str(tmp_path / "t")
    write_pipe_table(_presi(spark), path, partitions=2)
    a = sorted((tuple(r) for r in spark.read.format("pipetext").load(path).collect()), key=repr)
    b = sorted((tuple(r) for r in read_pipe_table(spark, path).collect()), key=repr)
    assert a == b and len(a) == 4


def test_connector_write_roundtrip(spark, tmp_path):
    register_pipetext(spark)
    path = str(tmp_path / "t")
    df = _presi(spark)
    df.write.format("pipetext").mode("append").save(path)
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    back = sorted((tuple(r) for r in read_pipe_table(spark, path).collect()), key=repr)
    want = sorted((tuple(r) for r in df.collect()), key=repr)
    assert back == want


def test_partition_per_file(spark, tmp_path):
    register_pipetext(spark)
    path = str(tmp_path / "t")
    write_pipe_table(_presi(spark), path, partitions=3)
    n_files = len(
        [p for p in glob.glob(os.path.join(path, "*")) if "_SUCCESS" not in p]
    )
    got = (
        spark.read.format("pipetext")
        .load(path)
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert got == n_files >= 2  # one input partition per data file


def test_filter_pushdown_semantics(spark, tmp_path):
    register_pipetext(spark)
    path = str(tmp_path / "t")
    write_pipe_table(_presi(spark), path)
    df = spark.read.format("pipetext").load(path)
    # pushed: IsNotNull(any col) + EqualTo(text) — equals the plain scan
    got = sorted(
        r.text
        for r in df.filter(F.col("latitude").isNotNull())
        .filter(F.col("text") == "bonjour le monde")
        .collect()
    )
    assert got == ["bonjour le monde"]
    # float comparisons are NOT pushed (cast-literal precision — the
    # exact trap: float32(48.85) != 48.85d, so equality on a float col
    # is unreliable in EITHER engine); Spark applies range predicates
    # itself on the scan output: still exact
    assert df.filter(F.col("latitude") > 0).count() == 2


def test_stream_reader_tails_directory_exactly_once(spark, tmp_path):
    register_pipetext(spark)
    src = str(tmp_path / "feed")
    os.makedirs(src)

    def emit(seq, rows):
        with open(os.path.join(src, f"{seq:06d}.txt"), "w") as fh:
            for r in rows:
                fh.write(r + "\n")

    emit(0, ["alpha|1.0|2.0|2024-03-01 12:00:00.0", "beta|||"])
    sink: list = []

    stream = spark.readStream.format("pipetext").load(src)
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: sink.extend(tuple(r) for r in df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert sorted(r[0] for r in sink) == ["alpha", "beta"]
        # a new file arrives: the next batch delivers ONLY its rows
        emit(1, ["gamma|5.0|6.0|2024-03-01 13:00:00.0"])
        q.processAllAvailable()
        assert sorted(r[0] for r in sink) == ["alpha", "beta", "gamma"]
        # nothing new: no duplicates on a further drain
        q.processAllAvailable()
        assert len(sink) == 3
    finally:
        q.stop()
        q.awaitTermination(30)


def test_stream_reader_max_files_per_trigger(spark, tmp_path):
    register_pipetext(spark)
    src = str(tmp_path / "feed")
    os.makedirs(src)
    for i in range(5):
        with open(os.path.join(src, f"{i:06d}.txt"), "w") as fh:
            fh.write(f"row{i}|||\n")

    batches: list = []
    # progress_dir keeps the admission cap engaged from the very first
    # batch (without it, the first latestOffset after construction is
    # deliberately uncapped — the no-regression restart contract)
    stream = (
        spark.readStream.format("pipetext")
        .option("maxFilesPerTrigger", "2")
        .option("progress_dir", str(tmp_path / "progress"))
        .load(src)
    )
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: batches.append(df.count()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    nonzero = [b for b in batches if b > 0]
    assert sum(nonzero) == 5  # every row exactly once
    assert max(nonzero) <= 2  # backlog drained in capped batches
    assert len(nonzero) == 3  # 2 + 2 + 1


def test_synthdocs_partition_invariance_and_determinism(spark):
    from sparkstreamingtwitter_presidential_spark.sources.synthdocs_ds import (
        register_synthdocs,
    )

    register_synthdocs(spark)

    def rows(parts):
        return sorted(
            tuple(r)
            for r in spark.read.format("synthdocs")
            .option("n_rows", "300")
            .option("n_partitions", str(parts))
            .load()
            .collect()
        )

    a, b, c = rows(1), rows(7), rows(64)
    assert a == b == c and len(a) == 300  # content independent of slicing
    assert rows(7) == b  # and of the run
    # zero-row corner
    empty = (
        spark.read.format("synthdocs").option("n_rows", "0").load().count()
    )
    assert empty == 0


def test_synthdocs_stream_is_deterministic_rate_source(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.synthdocs_ds import (
        gen_row,
        register_synthdocs,
    )

    register_synthdocs(spark)
    sink: list = []
    stream = (
        spark.readStream.format("synthdocs")
        .option("rows_per_batch", "40")
        .option("max_rows", "100")
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: sink.append(sorted(tuple(r) for r in df.collect())))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    batches = [b for b in sink if b]
    assert [len(b) for b in batches] == [40, 40, 20]  # capped drain
    got = sorted(sum(batches, []))
    want = sorted(gen_row(i) for i in range(100))
    assert got == want  # every row exactly once, content == pure function


def test_stream_reader_clean_restart_does_not_regress_offsets(spark, tmp_path):
    """After a CLEAN restart (all batches committed) Spark calls
    latestOffset() on a fresh reader before any partitions() call; with
    maxFilesPerTrigger set, an eagerly-capped reader would return an
    offset BEHIND the checkpoint and re-deliver already-read files.
    The first post-restart batch is uncapped instead (never a
    regression); the cap re-engages afterwards."""
    register_pipetext(spark)
    src = str(tmp_path / "feed")
    os.makedirs(src)

    def emit(seq):
        with open(os.path.join(src, f"{seq:06d}.txt"), "w") as fh:
            fh.write(f"row{seq}|||\n")

    for i in range(5):
        emit(i)
    ckpt = str(tmp_path / "ckpt")

    def run(sink):
        stream = (
            spark.readStream.format("pipetext")
            .option("maxFilesPerTrigger", "2")
            .load(src)
        )
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(
                lambda df, bid: sink.extend(r.text for r in df.collect())
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)

    first: list = []
    run(first)
    assert sorted(first) == [f"row{i}" for i in range(5)]

    emit(5)
    emit(6)
    second: list = []
    run(second)  # fresh reader, same checkpoint — the restart path
    assert sorted(second) == ["row5", "row6"], (
        "restart re-delivered already-committed files"
    )


def test_writer_overwrite_mode_replaces_existing_data(spark, tmp_path):
    register_pipetext(spark)
    out = str(tmp_path / "out")
    df1 = spark.createDataFrame(
        [("old1", None, None, None), ("old2", None, None, None)],
        "text string, latitude float, longitude float, created_at timestamp",
    )
    df2 = spark.createDataFrame(
        [("new1", None, None, None)],
        "text string, latitude float, longitude float, created_at timestamp",
    )
    df1.write.format("pipetext").mode("append").save(out)
    df2.write.format("pipetext").mode("overwrite").save(out)
    got = [r.text for r in spark.read.format("pipetext").load(out).collect()]
    assert got == ["new1"], f"overwrite behaved like append: {got}"
    # and append still appends
    df1.write.format("pipetext").mode("append").save(out)
    got = sorted(r.text for r in spark.read.format("pipetext").load(out).collect())
    assert got == ["new1", "old1", "old2"]


def test_synthdocs_stream_restart_resumes_from_progress_dir(spark, tmp_path):
    """The generator has no external backlog to re-list, so exact
    replay across a CLEAN restart needs the persisted high-water mark
    (progress_dir); with it, a fresh reader's first latestOffset
    resumes at the committed row, never behind it."""
    from sparkstreamingtwitter_presidential_spark.sources.synthdocs_ds import (
        gen_row,
        register_synthdocs,
    )

    register_synthdocs(spark)
    ckpt = str(tmp_path / "ckpt")
    prog = str(tmp_path / "progress")

    def run(max_rows, sink):
        stream = (
            spark.readStream.format("synthdocs")
            .option("rows_per_batch", "40")
            .option("max_rows", str(max_rows))
            .option("progress_dir", prog)
            .load()
        )
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(
                lambda df, bid: sink.extend(tuple(r) for r in df.collect())
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)

    first: list = []
    run(80, first)
    assert sorted(first) == sorted(gen_row(i) for i in range(80))

    second: list = []
    run(120, second)  # fresh reader, same checkpoint + progress
    assert sorted(second) == sorted(gen_row(i) for i in range(80, 120)), (
        "restart re-emitted rows already delivered"
    )


def test_stream_reader_capped_restart_with_progress_dir(spark, tmp_path):
    """With progress_dir, the cap stays engaged across a clean restart
    AND no file is re-delivered: the persisted high-water mark seeds
    the fresh reader."""
    register_pipetext(spark)
    src = str(tmp_path / "feed")
    os.makedirs(src)

    def emit(seq):
        with open(os.path.join(src, f"{seq:06d}.txt"), "w") as fh:
            fh.write(f"row{seq}|||\n")

    for i in range(3):
        emit(i)
    ckpt, prog = str(tmp_path / "ckpt"), str(tmp_path / "progress")

    def run(sink, batches):
        stream = (
            spark.readStream.format("pipetext")
            .option("maxFilesPerTrigger", "2")
            .option("progress_dir", prog)
            .load(src)
        )
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(
                lambda df, bid: (
                    sink.extend(r.text for r in df.collect()),
                    batches.append(df.count()),
                )
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)

    s1, b1 = [], []
    run(s1, b1)
    assert sorted(s1) == ["row0", "row1", "row2"]
    assert max(b for b in b1 if b) <= 2  # capped even on batch 0

    for i in range(3, 8):
        emit(i)
    s2, b2 = [], []
    run(s2, b2)
    assert sorted(s2) == [f"row{i}" for i in range(3, 8)]
    assert max(b for b in b2 if b) <= 2  # cap engaged right after restart
