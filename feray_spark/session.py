"""SparkSession factory.

One place for every engine-level config so local tests, the bench
harness, and a real cluster deployment share identical semantics:

- AQE on (runtime re-planning, partition coalescing, skew-join
  splitting) — the scale path for the 100 TB posture.
- Arrow on for every Python<->JVM exchange (pandas UDFs, toPandas).
- Session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle (DuckDB timestamps are TZ-naive).
- ``spark.sql.shuffle.partitions`` sized to the actual parallelism
  instead of the 200 default (wrong in both directions).

On a real cluster the same factory is used with ``master=None`` so
spark-submit / the cluster manager supplies master & sizing; only
the semantic configs (ANSI, TZ, Arrow, AQE) are forced.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Semantics-bearing configs: identical everywhere (tests, bench, cluster).
SEMANTIC_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # ANSI off: the engine contract is permissive SQL semantics
    # (NULL on bad cast / div-by-zero), matching the declared polars
    # engine surface of the reference rather than erroring mid-job.
    "spark.sql.ansi.enabled": "false",
    # Fixture `events.ts` has shipped as INT64 TIMESTAMP(NANOS) —
    # which Spark's vectorized reader rejects — and (newer vintages)
    # as TIMESTAMP(US). Read nanos as long so the ns vintage loads;
    # catalog.normalize_events_ts converts either surface form to
    # session-TZ timestamp (matching the DuckDB oracle's ns -> us
    # truncation). Harmless when the fixture is already us.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # NOTE: deliberately NOT setting
    # coalescePartitions.parallelismFirst=false. It shaves ~15% off
    # the per-query scheduling floor on tiny relational results, but
    # AQE's byte-based sizing then coalesces CPU-heavy, byte-small
    # stages (cosine folds / rank windows over array columns) onto
    # ONE task — measured 20x regressions on the embedding suite.
    # Byte size is a poor proxy for CPU cost; keep parallelism-first.
}

# Performance configs that are correct at EVERY scale (value-neutral,
# byte-bounded, AQE-governed) — applied alongside SEMANTIC_CONF to
# factory sessions and to externally-built driver sessions.
ENGINE_PERF_CONF: dict[str, str] = {
    # Let AQE rewrite a planned sort-merge join to a shuffled hash
    # join when every post-shuffle partition of the build side is
    # under this bound (default 0 = never): drops both sort passes
    # from fact-fact joins. The bound is PER PARTITION, so it stays
    # valid as data grows — partitions are AQE-advisory-sized. NOTE
    # (ADVICE r10): the threshold bounds a partition's COMPRESSED
    # shuffle bytes, not the built hash table's heap footprint —
    # decompression plus Java object/row overhead can multiply it
    # several-fold, so the local worst case is "32 tasks x 128 MB
    # compressed" = 4 GB of shuffle input whose in-memory build side
    # may be a small multiple of that; sized against the 16 GB local
    # heap with that multiple in mind, and a topology with less
    # memory per task slot should shrink this bound rather than
    # trust the 4 GB figure. Measured at the 64x probe corpus
    # (interleaved noop A/B, outputs equal): ep10 12.44 -> 10.45 s,
    # ep17 3.10 -> 2.71 s, ep7 neutral; sf0.1 neutral-to-positive on
    # every probed SMJ query (ep17 0.83 -> 0.64 s, l2 2.15 -> 1.78 s,
    # no regressions).
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "128m",
}


def get_spark(
    app_name: str = "feray-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    driver_mem: str | None = None,
    ui: bool = False,
    extra_conf: dict[str, str] | None = None,
    master: str | None = "local",
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied.

    ``cores`` — int N for ``local[N]``, "*" for all, None → env
    ``SPARK_GRAFT_CPUS`` or all cores. Only meaningful for local mode.
    ``master`` — "local" (default) builds ``local[cores]``; any other
    string is passed through (e.g. "yarn"); None leaves the master
    entirely to spark-submit / the cluster manager — the cluster path
    the module docstring describes, where only semantic configs are
    forced and sizing comes from ``cluster_profile()`` / --conf.
    """
    builder = SparkSession.builder.appName(app_name)
    local = master == "local"
    if local:
        if cores is None:
            cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
        builder = builder.master(f"local[{cores}]")
    elif master is not None:
        builder = builder.master(master)
    if shuffle_partitions is None and local:
        ncpu = os.cpu_count() or 8
        shuffle_partitions = ncpu if cores in ("*", None) else int(cores)
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    if local:
        if driver_mem is None:
            driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        builder = builder.config("spark.driver.memory", driver_mem)
    builder = builder.config("spark.ui.enabled", "true" if ui else "false")
    if local:
        # whole-stage codegen emits one JIT-compiled class per plan
        # shape; a wide query catalog (the bench sweeps ~100 distinct
        # plans) overflows the JVM's default 240 MB code cache, after
        # which the JIT flushes hot methods and queries rerun
        # semi-interpreted — measured 2x+ slowdowns on codegen-heavy
        # operators. Local mode only: on a cluster, driver JVM flags
        # belong to the deployment (spark-defaults.conf / spark-submit)
        # and setting extraJavaOptions here would CLOBBER them — a
        # pre-JVM SparkConf() cannot see spark-defaults.conf to append.
        # SPARK_GRAFT_DRIVER_JAVA_OPTS prepends caller flags locally.
        # append each default only if the caller hasn't set that FLAG
        # themselves (HotSpot takes the last occurrence, so blindly
        # appending would silently override a deliberate caller
        # sizing passed via SPARK_GRAFT_DRIVER_JAVA_OPTS)
        existing_opts = os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", "")
        for token, flag in (
            ("ReservedCodeCacheSize", "-XX:ReservedCodeCacheSize=1g"),
            ("UseCodeCacheFlushing", "-XX:+UseCodeCacheFlushing"),
        ):
            if token not in existing_opts:
                existing_opts = f"{existing_opts} {flag}".strip()
        builder = builder.config("spark.driver.extraJavaOptions", existing_opts)
    # ...and the compiled-class cache that fronts the JIT: it holds
    # 100 generated classes by default, while the query catalog
    # compiles several codegen units per query — a sweep over the
    # catalog thrashes the cache and recompiles (javac + JIT) every
    # plan every time. Static conf: must be set before the first
    # session.
    builder = builder.config("spark.sql.codegen.cache.maxEntries", "5000")
    # one BLAS thread per python worker: N workers x M BLAS threads
    # oversubscribes the executor's cores on numpy-matmul operators
    # (similarity scans); parallelism comes from partitions, not BLAS
    for ev in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        builder = builder.config(f"spark.executorEnv.{ev}", "1")
    # bound driver-side status-store growth: long-lived sessions (a
    # serving endpoint, a bench loop, a notebook) accumulate job/stage/
    # task/SQL-execution state in the AppStatusListener even with the
    # UI off, and listener-bus processing slows every subsequent job
    for k, v in {
        "spark.ui.retainedJobs": "100",
        "spark.ui.retainedStages": "200",
        "spark.ui.retainedTasks": "5000",
        "spark.sql.ui.retainedExecutions": "20",
        "spark.ui.dagGraph.retainedRootRDDs": "50",
    }.items():
        builder = builder.config(k, v)
    for k, v in SEMANTIC_CONF.items():
        builder = builder.config(k, v)
    for k, v in ENGINE_PERF_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def cluster_profile(
    *,
    executors: int = 1000,
    cores_per_executor: int = 4,
    target_partition_mb: int = 128,
) -> dict[str, str]:
    """Recommended conf for a real multi-executor deployment — the
    sizing knobs local mode never exercises, derived from the target
    topology instead of guessed. Use with ``get_spark(extra_conf=
    cluster_profile())`` under spark-submit, or feed to
    ``--conf``.

    Rationale per knob (all public Spark configuration):

    - shuffle partitions = 2 × total cores: every reduce wave keeps
      all cores busy and AQE coalesces the tail down, never up.
    - ``maxPartitionBytes`` pins scan-split size so a 100 TB scan
      yields ~target-sized tasks regardless of file layout.
    - speculation on: at 4000 cores a single straggling node
      otherwise holds the stage tail (median-based re-launch is
      cheap insurance at this width).
    - dynamic allocation + shuffle tracking: queries in this catalog
      alternate scan-heavy and CPU-heavy stages; idle executors
      release instead of billing.
    - shuffle IO hardening (retries, maxRemoteBlockSizeFetchToMem)
      for long fact-fact shuffle waves.
    """
    total_cores = executors * cores_per_executor
    return {
        "spark.executor.cores": str(cores_per_executor),
        "spark.sql.shuffle.partitions": str(2 * total_cores),
        "spark.sql.files.maxPartitionBytes": f"{target_partition_mb}m",
        "spark.speculation": "true",
        "spark.speculation.multiplier": "3",
        "spark.dynamicAllocation.enabled": "true",
        "spark.dynamicAllocation.maxExecutors": str(executors),
        "spark.dynamicAllocation.shuffleTracking.enabled": "true",
        "spark.shuffle.io.maxRetries": "10",
        "spark.network.maxRemoteBlockSizeFetchToMem": "512m",
        "spark.stage.maxConsecutiveAttempts": "8",
    }


def apply_semantics(spark: SparkSession) -> SparkSession:
    """Force the semantic configs onto an externally-created session.

    The driver harness hands us its own SparkSession; runtime-settable
    semantic configs (TZ, ANSI, AQE, Arrow) are applied so query
    results are identical to sessions built by :func:`get_spark`.
    Shuffle partitions are also right-sized (semantics-neutral,
    runtime-settable): an externally-built session typically carries
    the 200 default, which at local scale means every shuffle
    schedules 200 tasks for AQE to re-coalesce — pure per-query
    overhead. Static confs (JIT/codegen cache sizing) cannot be
    applied here; they only exist on sessions built by get_spark.
    """
    for k, v in {**SEMANTIC_CONF, **ENGINE_PERF_CONF}.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - static conf on some builds
            pass
    try:
        cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
        par = spark.sparkContext.defaultParallelism
        if cur > 4 * par:  # only fix the oversized default, never a choice
            spark.conf.set("spark.sql.shuffle.partitions", str(par))
    except Exception:  # pragma: no cover
        pass
    return spark
