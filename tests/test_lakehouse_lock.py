"""_staged_iceberg_locked liveness: heartbeat keeps slow builds alive
indefinitely, a stale (heartbeat-less) lock is taken over and rebuilt,
and a failed build leaves no half-built table behind a dead lock."""

from __future__ import annotations

import os
import threading
import time

from sparkstreamingtwitter_presidential_spark.queries import lakehouse as lh


def test_stale_lock_is_taken_over_and_rebuilt(spark, tmp_path, monkeypatch):
    table = str(tmp_path / "t")
    os.makedirs(table)
    lock = os.path.join(table, "_BUILD_LOCK")
    open(lock, "w").close()
    old = time.time() - 3600  # crashed builder: heartbeat stopped
    os.utime(lock, (old, old))
    built = []

    def build(s, t):
        built.append(t)
        open(os.path.join(t, "DATA"), "w").close()

    got = lh._staged_iceberg_locked(spark, table, build)
    assert got == table and built == [table]
    assert os.path.exists(os.path.join(table, "_READY"))
    assert os.path.exists(os.path.join(table, "DATA"))
    assert not os.path.exists(os.path.join(table, "_BUILD_LOCK.stale"))


def test_fresh_lock_waits_for_the_live_builder(spark, tmp_path):
    table = str(tmp_path / "t")
    os.makedirs(table)
    lock = os.path.join(table, "_BUILD_LOCK")
    open(lock, "w").close()  # a LIVE builder holds the lock (fresh mtime)

    def finish():
        time.sleep(1.5)
        open(os.path.join(table, "_READY"), "w").close()

    t = threading.Thread(target=finish)
    t.start()
    built = []
    got = lh._staged_iceberg_locked(spark, table, lambda s, p: built.append(p))
    t.join()
    assert got == table
    assert built == []  # waited for the builder, never rebuilt


def test_failed_build_clears_the_claim(spark, tmp_path):
    table = str(tmp_path / "t")

    def boom(s, t):
        open(os.path.join(t, "PARTIAL"), "w").close()
        raise RuntimeError("build died")

    try:
        lh._staged_iceberg_locked(spark, table, boom)
    except RuntimeError:
        pass
    else:  # pragma: no cover
        raise AssertionError("expected the build error to propagate")
    # no half-built table, no wedged lock: the next caller rebuilds
    assert not os.path.exists(os.path.join(table, "PARTIAL"))
    assert not os.path.exists(os.path.join(table, "_BUILD_LOCK"))
    got = lh._staged_iceberg_locked(
        spark, table, lambda s, t: open(os.path.join(t, "OK"), "w").close()
    )
    assert got == table and os.path.exists(os.path.join(table, "OK"))
