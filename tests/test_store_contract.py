"""One versioned-table contract, two backends.

The segment-log :class:`TableStore` documents itself as a mechanical
swap for real Delta (table_store.py module docstring); this suite is
that promise made executable: every assertion runs against the
segment-log store unconditionally, and against
:class:`feray_spark.sources.delta_store.DeltaTableStore` whenever the
runtime actually has delta-spark (package + session extension). In
this image delta-spark is absent, so the delta parametrization
reports as skipped — on a Delta-equipped deployment the same file
proves behavioral equivalence with zero edits.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from feray_spark.sources import delta_store
from feray_spark.sources.table_store import TableStore

BACKENDS = ["segment_log", "delta"]


class _SegmentAdapter:
    def __init__(self, spark, root):
        self.spark = spark
        self.ts = TableStore(root)

    def write(self, df, table, mode="overwrite", user_metadata=None, partition_by=None,
              merge_schema=False):
        self.ts.write(
            df, table, mode=mode, user_metadata=user_metadata,
            partition_by=partition_by, merge_schema=merge_schema,
        )

    def read(self, table, version=None):
        return self.ts.read(self.spark, table, version=version)

    def latest_version(self, table):
        return self.ts.latest_version(table)

    def user_metadata(self, table):
        return self.ts.commit_info(table).user_metadata

    def merge(self, table, source, keys):
        self.ts.merge(self.spark, table, source, keys=keys)

    def replace_where(self, table, replacement, predicate):
        self.ts.replace_where(self.spark, table, replacement, predicate)

    def changes(self, table, from_version, to_version=None, keys=None):
        return self.ts.changes(
            self.spark, table, from_version, to_version=to_version, keys=keys
        )

    def restore(self, table, version):
        self.ts.restore(table, version)

    def clone(self, src_table, dst_table, version=None):
        self.ts.clone(src_table, dst_table, version=version)


class _DeltaAdapter:
    def __init__(self, spark, root):
        self.spark = spark
        self.ds = delta_store.DeltaTableStore(root)
        # CDF must be on at table creation for the change-feed leg
        try:
            spark.conf.set(
                "spark.databricks.delta.properties.defaults."
                "enableChangeDataFeed",
                "true",
            )
        except Exception:
            pass

    def write(self, df, table, mode="overwrite", user_metadata=None, partition_by=None,
              merge_schema=False):
        self.ds.write(
            df, table, mode=mode, user_metadata=user_metadata,
            partition_by=partition_by, merge_schema=merge_schema,
        )

    def read(self, table, version=None):
        return self.ds.read(self.spark, table, version=version)

    def latest_version(self, table):
        return self.ds.latest_version(self.spark, table)

    def user_metadata(self, table):
        return self.ds.user_metadata(self.spark, table)

    def merge(self, table, source, keys):
        self.ds.merge(self.spark, table, source, keys=keys)

    def replace_where(self, table, replacement, predicate):
        self.ds.replace_where(self.spark, table, replacement, predicate)

    def changes(self, table, from_version, to_version=None, keys=None):
        return self.ds.changes(
            self.spark, table, from_version, to_version=to_version, keys=keys
        )

    def restore(self, table, version):
        self.ds.restore(self.spark, table, version)

    def clone(self, src_table, dst_table, version=None):
        self.ds.clone(self.spark, src_table, dst_table, version=version)


@pytest.fixture(params=BACKENDS)
def store(request, spark):
    root = tempfile.mkdtemp(prefix=f"store_contract_{request.param}_")
    if request.param == "delta":
        if not delta_store.available():
            pytest.skip("delta-spark not installed in this image")
        if not delta_store.session_ready(spark):
            pytest.skip(
                "delta-spark installed but the session lacks "
                "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension"
            )
        yield _DeltaAdapter(spark, root)
    else:
        yield _SegmentAdapter(spark, root)
    shutil.rmtree(root, ignore_errors=True)


def test_contract_versions_and_time_travel(store, spark):
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    store.write(df1, "t", mode="overwrite")
    df2 = spark.createDataFrame([(3, "c")], "id int, v string")
    store.write(df2, "t", mode="append")

    assert store.latest_version("t") == 1
    assert store.read("t").count() == 3
    assert store.read("t", version=0).count() == 2


def test_contract_commit_user_metadata(store, spark):
    df = spark.createDataFrame([(1, "a")], "id int, v string")
    store.write(df, "t", mode="overwrite", user_metadata={"fingerprint": "abc123"})
    assert store.user_metadata("t").get("fingerprint") == "abc123"


def test_contract_merge_upsert(store, spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    store.write(base, "t", mode="overwrite")
    src = spark.createDataFrame([(2, "B"), (3, "c")], "id int, v string")
    store.merge("t", src, keys=["id"])
    got = {(r.id, r.v) for r in store.read("t").collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_contract_merge_rejects_mismatched_source_schema(store, spark):
    """Delta semantics both backends must share: MERGE never evolves
    the TARGET schema. A source whose types reconcile by store-
    assignment cast (int→long, numeric→string) merges with its rows
    cast to the target's types; a missing/extra column or an unsafe
    cast (string→numeric) is rejected — the segment-log fallback
    (overwrite) must not silently adopt the source schema either
    way."""
    base = spark.createDataFrame([(1, 10)], "id int, v bigint")
    store.write(base, "t", mode="overwrite")
    # reconcilable source: v arrives as INT, stores as the target's
    # BIGINT — schema invariant, values merged
    narrow_typed = spark.createDataFrame([(2, 20)], "id int, v int")
    store.merge("t", narrow_typed, keys=["id"])
    assert store.read("t").schema["v"].dataType.simpleString() == "bigint"
    assert {(r.id, r.v) for r in store.read("t").collect()} == {(1, 10), (2, 20)}
    # unsafe cast: STRING source into a numeric column
    stringy = spark.createDataFrame([(3, "x")], "id int, v string")
    with pytest.raises(Exception, match="(?i)cast|type|merge"):
        store.merge("t", stringy, keys=["id"])
    assert store.read("t").schema["v"].dataType.simpleString() == "bigint"
    # column-set mismatch
    missing_col = spark.createDataFrame([(3,)], "id int")
    with pytest.raises(Exception, match="(?i)schema|column|merge|resolve"):
        store.merge("t", missing_col, keys=["id"])
    assert {(r.id, r.v) for r in store.read("t").collect()} == {(1, 10), (2, 20)}


def test_contract_replace_where_scope_and_nulls(store, spark):
    """Delta semantics both backends must share: replaceWhere swaps
    exactly the predicate-TRUE slice and KEEPS NULL-evaluating rows."""
    base = spark.createDataFrame(
        [(1, "x", 10.0), (2, None, 20.0), (3, "y", 30.0)],
        "id int, part string, v double",
    )
    store.write(base, "t", mode="overwrite")
    repl = spark.createDataFrame([(9, "x", 99.0)], "id int, part string, v double")
    store.replace_where("t", repl, "part = 'x'")
    got = {(r.id, r.part) for r in store.read("t").collect()}
    assert got == {(9, "x"), (2, None), (3, "y")}


def test_contract_schema_evolution(store, spark):
    """Delta semantics both backends must share: a mismatched append
    is rejected without mergeSchema; with it, new columns evolve the
    table schema and pre-evolution rows read the new column as NULL."""
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    store.write(base, "t", mode="overwrite")
    wider = spark.createDataFrame([(3, "c", 1.5)], "id int, v string, score double")
    with pytest.raises(Exception, match="(?i)schema|merge"):
        store.write(wider, "t", mode="append")
    store.write(wider, "t", mode="append", merge_schema=True)
    got = store.read("t")
    assert set(got.columns) == {"id", "v", "score"}
    rows = {r.id: r.score for r in got.collect()}
    assert rows == {1: None, 2: None, 3: 1.5}
    # time travel still serves the PRE-evolution schema
    assert set(store.read("t", version=0).columns) == {"id", "v"}


def test_contract_schema_evolution_rejects_retype(store, spark):
    base = spark.createDataFrame([(1, "a")], "id int, v string")
    store.write(base, "t", mode="overwrite")
    retyped = spark.createDataFrame([(2, 3.0)], "id int, v double")
    with pytest.raises(Exception):
        store.write(retyped, "t", mode="append", merge_schema=True)


def test_contract_change_feed_append_is_inserts(store, spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    store.write(base, "t", mode="overwrite")
    more = spark.createDataFrame([(3, "c"), (4, "d")], "id int, v string")
    store.write(more, "t", mode="append")
    ch = store.changes("t", from_version=0).collect()
    assert {(r.id, r._change_type, r._commit_version) for r in ch} == {
        (3, "insert", 1),
        (4, "insert", 1),
    }


def test_contract_change_feed_merge_classifies_updates(store, spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    store.write(base, "t", mode="overwrite")
    src = spark.createDataFrame([(2, "B"), (3, "c")], "id int, v string")
    store.merge("t", src, keys=["id"])
    ch = store.changes("t", from_version=0, keys=["id"])
    got = {(r.id, r.v, r._change_type) for r in ch.collect()}
    assert got == {
        (2, "b", "update_preimage"),
        (2, "B", "update_postimage"),
        (3, "c", "insert"),
    }


def test_contract_change_feed_empty_range(store, spark):
    """The standard poll — "anything since my last sync?" when
    nothing happened — must return an EMPTY feed, not error."""
    base = spark.createDataFrame([(1, "a")], "id int, v string")
    store.write(base, "t", mode="overwrite")
    latest = store.latest_version("t")
    assert store.changes("t", from_version=latest).count() == 0


def test_contract_partitioned_write_roundtrip(store, spark):
    df = spark.createDataFrame(
        [(1, 1995, 10.0), (2, 1995, 20.0), (3, 1996, 30.0)],
        "id int, yr int, v double",
    )
    store.write(df, "t", mode="overwrite", partition_by=["yr"])
    got = store.read("t").filter("yr = 1995")
    assert got.count() == 2
    assert {r.id for r in got.collect()} == {1, 2}


def test_contract_restore_rolls_head_back_keeping_history(store, spark):
    """RESTORE semantics both backends share: restoring to an earlier
    version is a NEW commit whose content equals that version; the
    rolled-back snapshots stay time-travelable."""
    v0 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    store.write(v0, "t", mode="overwrite")
    store.write(
        spark.createDataFrame([(3, "c")], "id int, v string"), "t", mode="append"
    )
    store.write(
        spark.createDataFrame([(9, "z")], "id int, v string"), "t", mode="overwrite"
    )

    store.restore("t", 1)
    assert store.latest_version("t") == 3  # restore IS a commit
    got = {(r.id, r.v) for r in store.read("t").collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}
    # the overwritten middle state is still readable
    assert {(r.id, r.v) for r in store.read("t", version=2).collect()} == {(9, "z")}


def test_contract_shallow_clone_is_independent(store, spark):
    """SHALLOW CLONE semantics both backends share: the clone is born
    with the source snapshot's content and then lives independently —
    writes to the clone never touch the source."""
    src = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    store.write(src, "src", mode="overwrite")
    store.clone("src", "dst")

    assert {(r.id, r.v) for r in store.read("dst").collect()} == {(1, "a"), (2, "b")}
    store.write(
        spark.createDataFrame([(3, "c")], "id int, v string"), "dst", mode="append"
    )
    assert store.read("dst").count() == 3
    assert store.read("src").count() == 2
    assert store.latest_version("src") == 0


def test_optimistic_concurrency_primitive_and_live_race(spark, tmp_path):
    """The segment-log's LogStore contract, exercised both ways.

    Primitive: a _commit against an already-claimed version must raise
    ConcurrentWriteError AND delete the losing attempt's segment (no
    orphan data for read_stream's glob to pick up).

    Live: concurrent appenders racing on one table, each retrying on
    conflict, must all land exactly once — contiguous versions, no lost
    or duplicated rows (the caller-retries model the docstrings
    promise; real Delta resolves the same race inside its own
    transaction protocol, so this leg is segment-log-specific)."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    from feray_spark.sources.table_store import (
        Commit,
        ConcurrentWriteError,
        TableStore,
    )

    ts = TableStore(str(tmp_path / "race"))
    ts.write(spark.range(1).selectExpr("id AS k"), "t", mode="overwrite")
    v0 = ts.latest_version("t")

    # --- primitive: losing racer errors and cleans its segment
    loser_seg = str(tmp_path / "race" / "t" / "loser-segment")
    os.makedirs(loser_seg)
    with open(os.path.join(loser_seg, "part-0.parquet"), "wb") as f:
        f.write(b"x")
    head = ts.commit_info("t")
    with pytest.raises(ConcurrentWriteError):
        ts._commit(
            "t",
            Commit(
                version=v0,  # already claimed by the seed write
                mode="append",
                segments=[*head.segments, loser_seg],
                schema=head.schema,
                row_count=head.row_count + 1,
                timestamp=head.timestamp,
                user_metadata={},
                partition_by=[],
            ),
            new_segment=loser_seg,
        )
    assert not os.path.exists(loser_seg), "losing segment must be deleted"

    # --- live race: N concurrent appenders, retry-on-conflict
    n_writers = 6

    def appender(i: int) -> None:
        df = spark.range(10).selectExpr(f"id + {(i + 1) * 100} AS k")
        for _ in range(25):
            try:
                ts.write(df, "t", mode="append")
                return
            except ConcurrentWriteError:
                continue
        raise AssertionError(f"writer {i} starved out after 25 retries")

    with ThreadPoolExecutor(max_workers=n_writers) as ex:
        list(ex.map(appender, range(n_writers)))

    assert ts.latest_version("t") == v0 + n_writers  # contiguous, none lost
    out = ts.read(spark, "t")
    assert out.count() == 1 + 10 * n_writers
    # every appender's rows landed exactly once
    assert out.filter("k >= 100").distinct().count() == 10 * n_writers


def test_write_expected_base_guards_lost_updates(spark, tmp_path):
    """The optimistic pin for read-modify-write callers: an overwrite
    deriving from a stale snapshot must raise instead of silently
    erasing the interleaved commit."""
    from feray_spark.sources.table_store import ConcurrentWriteError, TableStore

    ts = TableStore(str(tmp_path / "pin"))
    ts.write(spark.range(3).selectExpr("id AS k"), "t", mode="overwrite")
    v0 = ts.latest_version("t")
    ts.write(spark.range(3, 6).selectExpr("id AS k"), "t", mode="append")
    with pytest.raises(ConcurrentWriteError):
        ts.write(
            spark.range(9).selectExpr("id AS k"), "t",
            mode="overwrite", expected_base=v0,
        )
    # rows from the interleaved append are intact
    assert ts.read(spark, "t").count() == 6


def test_merge_raises_on_interleaved_append(spark, tmp_path):
    """MERGE reads a snapshot, rewrites, commits — an append landing
    between the snapshot read and the commit must surface as
    ConcurrentWriteError (the retry signal), never as silently
    erased rows."""
    from feray_spark.sources.table_store import ConcurrentWriteError, TableStore

    class Racy(TableStore):
        """Deterministic interleave: the first pinned read inside
        merge() triggers a competing append before merge commits."""

        fired = False

        def read(self, spark_, table, version=None):
            df = super().read(spark_, table, version=version)
            if version is not None and not self.fired:
                self.fired = True
                super().write(
                    spark_.range(100, 101).selectExpr("id AS k", "id AS v"),
                    table,
                    mode="append",
                )
            return df

    ts = Racy(str(tmp_path / "racym"))
    ts.write(
        spark.range(3).selectExpr("id AS k", "id AS v"), "t", mode="overwrite"
    )
    src = spark.range(1).selectExpr("id AS k", "id + 50 AS v")
    with pytest.raises(ConcurrentWriteError):
        ts.merge(spark, "t", src, keys=["k"])
    # the interleaved row survived; a plain retry then lands the merge
    assert ts.read(spark, "t").filter("k = 100").count() == 1
    ts.merge(spark, "t", src, keys=["k"])
    got = {r.k: r.v for r in ts.read(spark, "t").collect()}
    assert got[0] == 50 and got[100] == 100


def test_replace_where_metadata_path_rejects_schema_drift(spark, tmp_path):
    """The partition-pruned replaceWhere path must enforce the same
    invariant-target-schema rule as the rewrite path — a retyped or
    extra column would otherwise be committed and silently NULL out
    under the table schema's cast on read."""
    from feray_spark.sources.table_store import TableStore

    ts = TableStore(str(tmp_path / "rw"))
    base = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-02", 2)], "ds string, v long"
    )
    ts.write(base, "t", mode="overwrite", partition_by=["ds"])
    retyped = spark.createDataFrame([("2024-01-01", "oops")], "ds string, v string")
    with pytest.raises(ValueError, match="replaceWhere source"):
        ts.replace_where(spark, "t", retyped, "ds = '2024-01-01'")
    extra = spark.createDataFrame(
        [("2024-01-01", 1, 9)], "ds string, v long, bonus long"
    )
    with pytest.raises(ValueError, match="extra"):
        ts.replace_where(spark, "t", extra, "ds = '2024-01-01'")


def test_append_schema_evolution_is_case_insensitive(spark, tmp_path):
    """An append carrying 'ID' against a table with 'id' is the SAME
    column under Spark's default resolution — evolution must neither
    commit a duplicate-modulo-case schema (unreadable) nor let the
    case variant retype the column."""
    import json as _json

    from feray_spark.sources.table_store import TableStore

    ts = TableStore(str(tmp_path / "case"))
    ts.write(spark.range(2).selectExpr("id"), "t", mode="overwrite")
    ts.write(
        spark.range(2, 4).selectExpr("id AS ID"), "t",
        mode="append", merge_schema=True,
    )
    schema = _json.loads(ts.commit_info("t").schema)
    assert [f["name"] for f in schema["fields"]] == ["id"]
    assert ts.read(spark, "t").count() == 4
    with pytest.raises(ValueError, match="type change"):
        ts.write(
            spark.range(1).selectExpr("CAST(id AS STRING) AS ID"), "t",
            mode="append", merge_schema=True,
        )


def test_zorder_many_columns_clamps_interleave(spark, tmp_path):
    """bits x ncols past 63 would wrap Java's mod-64 shift and record a
    clustered layout that never happened; the clamp trades bucket
    granularity for a correct curve. 9 columns x default 64 buckets
    (6 bits) exceeds 63 — the optimize must still produce identical
    contents."""
    from feray_spark.sources.table_store import TableStore

    ts = TableStore(str(tmp_path / "z"))
    df = spark.range(200).selectExpr(
        *[f"CAST(id * {i + 1} % 97 AS DOUBLE) AS c{i}" for i in range(9)],
        "id",
    )
    ts.write(df, "t", mode="overwrite")
    before = sorted(r.id for r in ts.read(spark, "t").collect())
    ts.optimize(spark, "t", zorder_by=[f"c{i}" for i in range(9)], n_files=2)
    after = sorted(r.id for r in ts.read(spark, "t").collect())
    assert before == after


def test_vacuum_sweeps_crashed_commit_tmp_files(spark, tmp_path):
    """A writer that dies between writing its .tmp log record and the
    os.link publish leaves the tmp file in _log; vacuum must collect
    it under the orphan grace period."""
    import os

    from feray_spark.sources.table_store import TableStore

    ts = TableStore(str(tmp_path / "jan"))
    ts.write(spark.range(2).selectExpr("id AS k"), "t", mode="overwrite")
    ts.write(spark.range(2).selectExpr("id AS k"), "t", mode="append")
    log_dir = ts._log_dir("t")
    dead = os.path.join(log_dir, ".tmp-deadbeef")
    with open(dead, "w") as f:
        f.write("{}")
    os.utime(dead, (1, 1))  # ancient
    deleted = ts.vacuum("t", keep_versions=1, orphan_grace_sec=60)
    assert dead in deleted and not os.path.exists(dead)
    # the live log records are untouched
    assert ts.read(spark, "t").count() == 4


def test_contract_numeric_looking_string_partitions(store, spark):
    """Hive directory inference retypes all-numeric string partition
    values ("01" -> int 1 -> "1" under a cast-back) — reads must go
    through the COMMITTED schema so values round-trip losslessly.
    Real Delta resolves partition values from its own metadata; the
    segment-log store must match."""
    df = spark.createDataFrame(
        [("01", 1), ("02", 2), ("02", 3)], "k string, v int"
    )
    store.write(df, "t", mode="overwrite", partition_by=["k"])
    got = sorted((r.k, r.v) for r in store.read("t").collect())
    assert got == [("01", 1), ("02", 2), ("02", 3)]


def test_replace_where_validation_survives_numeric_partition_names(
    spark, tmp_path
):
    """The metadata-path read-back validation evaluates the predicate
    over the just-written segment; with hive inference the all-numeric
    string partition value '01' would re-read as int 1 and a LIKE
    predicate would spuriously flag every replacement row as a
    violation. The read-back must use the committed schema."""
    from feray_spark.sources.table_store import TableStore

    ts = TableStore(str(tmp_path / "numpart"))
    base = spark.createDataFrame(
        [("01", 1), ("02", 2)], "k string, v long"
    )
    ts.write(base, "t", mode="overwrite", partition_by=["k"])
    repl = spark.createDataFrame([("01", 10)], "k string, v long")
    ts.replace_where(spark, "t", repl, "k LIKE '01%'")
    got = sorted((r.k, r.v) for r in ts.read(spark, "t").collect())
    assert got == [("01", 10), ("02", 2)]
    # change feed over the partitioned append path keeps fidelity too
    ts.write(
        spark.createDataFrame([("03", 3)], "k string, v long"),
        "t", mode="append",
    )
    feed = ts.changes(spark, "t", from_version=1)
    ins = [(r.k, r.v) for r in feed.filter("_change_type = 'insert'").collect()]
    assert ("03", 3) in ins


def test_history_tail_matches_history_newest_first(spark, tmp_path):
    """history_tail(n) = the newest n commits, newest-first, without
    parsing the whole log (the per-micro-batch guard's access path)."""
    from feray_spark.sources.table_store import TableStore

    ts = TableStore(str(tmp_path / "tail"))
    ts.write(spark.range(1).selectExpr("id"), "t", mode="overwrite")
    for _ in range(6):
        ts.write(spark.range(1).selectExpr("id"), "t", mode="append")
    full = ts.history("t")
    tail = ts.history_tail("t", 3)
    assert [c.version for c in tail] == [c.version for c in reversed(full[-3:])]
    assert [c.version for c in ts.history_tail("t", 100)] == [
        c.version for c in reversed(full)
    ]
    assert ts.history_tail("no_such_table", 3) == []
