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


def test_sweep_superseded_staging_versions(tmp_path):
    """r15 verdict item 7: a version bump in a staging family's name
    (specevo2 -> specevo3) retires every LOWER-version sibling — plus
    their .staging-*/.stale leftovers — while keeping same-version
    dirs under other keys (other sf_dirs), NEWER versions (an old
    checkout must not delete a newer build's cache), and other
    families."""
    root = tmp_path
    cur = root / "ssp_iceberg_specevo3_0123456789ab"
    keep = [
        cur,
        root / "ssp_iceberg_specevo3_ba9876543210",  # same ver, other key
        root / "ssp_iceberg_specevo4_0123456789ab",  # newer version
        root / "ssp_iceberg_events_0123456789ab",  # other family
        root / "unrelated_dir",
    ]
    sweep = [
        root / "ssp_iceberg_specevo2_0123456789ab",
        root / "ssp_iceberg_specevo_0123456789ab",  # unversioned = v0
        root / "ssp_iceberg_specevo2_0123456789ab.staging-deadbeef",
    ]
    for d in keep + sweep:
        os.makedirs(d)
        open(os.path.join(d, "x"), "w").close()
    stale = root / "ssp_iceberg_specevo2_0123456789ab.stale"
    open(stale, "w").close()
    lh._sweep_superseded_staging(str(cur))
    for d in keep:
        assert d.exists(), f"live cache swept: {d.name}"
    for d in sweep:
        assert not d.exists(), f"superseded staging kept: {d.name}"
    assert not stale.exists()
    # a malformed / non-engine name never sweeps anything
    lh._sweep_superseded_staging(str(root / "not_a_staging_dir"))
    assert (root / "ssp_iceberg_events_0123456789ab").exists()


def test_cold_build_sweeps_superseded_versions(spark, tmp_path):
    """The sweep runs after a successful cold build through
    _staged_iceberg_locked (and never on the warm path)."""
    old = tmp_path / "ssp_fam2_0123456789ab"
    os.makedirs(old)
    table = str(tmp_path / "ssp_fam3_0123456789ab")

    def build(s, t):
        open(os.path.join(t, "DATA"), "w").close()

    lh._staged_iceberg_locked(spark, table, build)
    assert not old.exists(), "cold build must sweep the older version"
    # warm path: recreate the old dir; a warm call must NOT sweep it
    os.makedirs(old)
    lh._staged_iceberg_locked(spark, table, build)
    assert old.exists(), "warm path must not touch siblings"
