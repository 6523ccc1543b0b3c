"""TableStore.optimize — compaction + Z-order layout (the Delta
``OPTIMIZE [ZORDER BY]`` analog).

The skipping test verifies the 100 TB claim at its root: parquet
row-group pruning is driven by footer min/max stats, so the test
reads the written files' footers with pyarrow and counts how many
files a range predicate could NOT skip — before and after Z-order.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from feray_spark.sources.table_store import TableStore


@pytest.fixture
def root():
    d = tempfile.mkdtemp(prefix="optimize_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _synthetic(spark, n=100_000):
    """Two independent uniform dimensions derived from id — so an
    insertion-ordered layout has full-range (unprunable) stats for
    both columns in every file."""
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 1000).alias("x"),
        ((F.col("id") * 2654435761) % 1000).alias("y"),
    )


def _files_of(store: TableStore, table: str) -> list[str]:
    commit = store.commit_info(table)
    out = []
    for entry in commit.segments:
        path = entry["path"] if isinstance(entry, dict) else entry
        out += glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    return out


def _overlapping_files(files: list[str], col: str, lo: float, hi: float) -> int:
    """Files whose [min, max] footer stats intersect [lo, hi] — the
    set a stats-pruning reader must actually open."""
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mn = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        mx = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        if mx >= lo and mn <= hi:
            hit += 1
    return hit


def test_optimize_preserves_rows_and_history(spark, root):
    store = TableStore(root)
    df = _synthetic(spark, 20_000)
    store.write(df, "t", mode="overwrite")
    before = store.read(spark, "t")
    commit = store.optimize(spark, "t", zorder_by=["x", "y"], n_files=4)
    assert commit.mode == "optimize"
    assert commit.row_count == 20_000
    after = store.read(spark, "t")
    # identical multiset of rows, new layout
    assert after.count() == 20_000
    assert after.exceptAll(before).count() == 0
    assert before.exceptAll(after).count() == 0
    # previous version stays time-travelable
    assert store.read(spark, "t", version=0).count() == 20_000
    assert store.commit_info("t").user_metadata["optimize"]["zorder_by"] == ["x", "y"]


def test_zorder_improves_multi_column_skipping(spark, root):
    store = TableStore(root)
    df = _synthetic(spark).repartition(64)
    store.write(df, "t", mode="overwrite")
    files_before = _files_of(store, "t")
    store.optimize(spark, "t", zorder_by=["x", "y"], n_files=64)
    files_after = _files_of(store, "t")
    assert len(files_after) == 64
    # a 10%-of-domain range predicate, checked on BOTH zorder columns:
    # insertion order leaves every file spanning the full range (no
    # pruning); the Z layout must leave most files skippable on EITHER
    # column — the multi-dimensional property a single-column sort
    # cannot give
    for col in ("x", "y"):
        before = _overlapping_files(files_before, col, 0, 99)
        after = _overlapping_files(files_after, col, 0, 99)
        assert before >= int(0.9 * len(files_before)), (col, before)
        assert after <= int(0.5 * len(files_after)), (col, after)
        assert after < before


def test_optimize_compacts_small_files(spark, root):
    store = TableStore(root)
    for i in range(10):
        store.write(
            spark.range(i * 100, (i + 1) * 100).toDF("id"),
            "t",
            mode="append" if i else "overwrite",
        )
    assert len(_files_of(store, "t")) > 10
    commit = store.optimize(spark, "t", n_files=2)
    assert commit.row_count == 1000
    assert len(_files_of(store, "t")) == 2
    assert store.read(spark, "t").count() == 1000
    # contents unchanged
    total = store.read(spark, "t").agg(F.sum("id")).collect()[0][0]
    assert total == sum(range(1000))


def test_optimize_rejects_non_rankable_zorder_column(spark, root):
    """A string zorder key would cast to all-NULL doubles, bucket
    everything to 0, and record a clustered layout that never
    happened — it must raise instead."""
    store = TableStore(root)
    store.write(
        spark.createDataFrame([(1, "a")], "id long, name string"), "t",
        mode="overwrite",
    )
    with pytest.raises(ValueError, match="non-rankable"):
        store.optimize(spark, "t", zorder_by=["name"], n_files=1)


def test_commit_put_if_absent_rejects_racing_writer(spark, root):
    """Optimistic concurrency at the log: of two writers publishing
    the same version, exactly one wins; the loser gets
    ConcurrentWriteError (not a silent clobber) and succeeds after
    re-resolving the next version."""
    import time as _time

    from feray_spark.sources.table_store import Commit, ConcurrentWriteError

    store = TableStore(root)
    df = spark.range(10).toDF("id")
    store.write(df, "t", mode="overwrite")
    base = store.commit_info("t")

    def commit_v(v):
        return Commit(
            version=v, mode="append", segments=base.segments,
            schema=base.schema, row_count=base.row_count,
            timestamp=_time.time(), user_metadata={}, partition_by=[],
        )

    store._commit("t", commit_v(1))  # writer A wins version 1
    with pytest.raises(ConcurrentWriteError):
        store._commit("t", commit_v(1))  # writer B loses the race
    # winner's record is intact, loser retries at the next version
    assert store.commit_info("t", 1).user_metadata == {}
    store._commit("t", commit_v(2))
    assert store.latest_version("t") == 2


def test_losing_racer_segment_is_cleaned_up(spark, root):
    """A losing writer must delete its un-committed segment so the
    streaming source's file glob never serves rows no commit
    references."""
    import os
    import time as _time

    from feray_spark.sources.table_store import Commit, ConcurrentWriteError

    store = TableStore(root)
    store.write(spark.range(5).toDF("id"), "t", mode="overwrite")
    base = store.commit_info("t")
    # loser's orphan-to-be: a real directory on disk
    loser_seg = os.path.join(root, "t", "seg-00000001-loser")
    os.makedirs(loser_seg)
    winner = Commit(
        version=1, mode="append", segments=base.segments,
        schema=base.schema, row_count=base.row_count,
        timestamp=_time.time(), user_metadata={}, partition_by=[],
    )
    store._commit("t", winner)
    loser = Commit(
        version=1, mode="append", segments=[*base.segments, loser_seg],
        schema=base.schema, row_count=base.row_count,
        timestamp=_time.time(), user_metadata={}, partition_by=[],
    )
    with pytest.raises(ConcurrentWriteError):
        store._commit("t", loser, new_segment=loser_seg)
    assert not os.path.exists(loser_seg)  # cleaned up on loss


def test_vacuum_collects_crash_orphans_after_grace(spark, root):
    import os

    store = TableStore(root)
    store.write(spark.range(5).toDF("id"), "t", mode="overwrite")
    orphan = os.path.join(root, "t", "seg-00000009-crashed")
    os.makedirs(orphan)
    # inside the grace window: protected (could be an in-flight writer)
    assert store.vacuum("t", keep_versions=1) == []
    assert os.path.isdir(orphan)
    # past the grace window: collected
    deleted = store.vacuum("t", keep_versions=1, orphan_grace_sec=0.0)
    assert any("seg-00000009-crashed" in d for d in deleted)
    assert not os.path.exists(orphan)


def test_vacuum_orphan_age_is_tree_deep(spark, root):
    """A hive-partitioned in-flight writer only touches NESTED
    partition subdirs, so the top-level segment dir's mtime goes
    stale while the write is live — orphan age must come from the
    newest mtime anywhere in the tree, or vacuum yanks an
    uncommitted segment mid-write."""
    import os
    import time as _time

    store = TableStore(root)
    store.write(spark.range(5).toDF("id"), "t", mode="overwrite")
    seg = os.path.join(root, "t", "seg-00000007-inflight")
    part = os.path.join(seg, "day=2024-01-01")
    os.makedirs(part)
    stale = _time.time() - 3600
    # top-level dir looks an hour old; the nested partition dir (and a
    # part-file inside it) are being written RIGHT NOW
    fresh_file = os.path.join(part, "part-00000.parquet")
    open(fresh_file, "wb").close()
    os.utime(seg, (stale, stale))
    assert store.vacuum("t", keep_versions=1, orphan_grace_sec=60.0) == []
    assert os.path.isdir(seg)  # protected by the fresh nested write
    # once the WHOLE tree is old, the orphan is collected
    for p in (seg, part, fresh_file):
        os.utime(p, (stale, stale))
    deleted = store.vacuum("t", keep_versions=1, orphan_grace_sec=60.0)
    assert any("seg-00000007-inflight" in d for d in deleted)
    assert not os.path.exists(seg)
