"""External asset registry publication — the reference's
sqlmodel/Postgres registry role (`projects/feray/pyproject.toml:27`
sqlmodel, `examples/pyproject.toml:66` dagster-postgres): a queryable
database table of what was materialized, when, at which version,
under which fingerprint, and whether its checks passed — the thing
dashboards, orchestrators and auditors read WITHOUT touching the
data lake.

The local segment-log commit metadata stays the source of truth;
:func:`publish_registry` MIRRORS it outward through
:func:`feray_spark.sources.connectors.jdbc_upsert`, so publication is
idempotent (re-publishing the same history is a no-op MERGE) and
amendments flow (check verdicts are amended onto a commit after its
write job — a later publish UPDATEs the registry row in place).

Scale note: the published relation is commit METADATA — one row per
(view, version), bounded by materialization count, never by data
size — so building it driver-side is correct at any corpus scale;
the upsert itself stages through Spark's distributed JDBC write.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

from feray_spark.features.store import FeatureStore
from feray_spark.sources.connectors import jdbc_upsert

#: registry relation: one row per (view_name, version)
REGISTRY_SCHEMA = (
    "view_name string, version long, mode string, row_count long, "
    "committed_at timestamp, fingerprint string, checks string, "
    "checks_passed boolean, inputs string, entities string"
)

#: DDL overrides for the JDBC CREATE: the MERGE key (view_name) and
#: the other short strings must be VARCHAR, not the dialect's default
#: LOB mapping — LOBs are not equality-comparable in MERGE ON (Derby)
#: and make lousy registry columns everywhere else
REGISTRY_DDL_TYPES = (
    "view_name VARCHAR(256), mode VARCHAR(32), fingerprint VARCHAR(256), "
    "checks VARCHAR(4096), inputs VARCHAR(1024), entities VARCHAR(1024)"
)


def registry_rows(store: FeatureStore) -> list[tuple]:
    """The registry relation for every commit of every registered
    view (un-materialized views have no commits and no rows — the
    registry records what HAPPENED, not what is declared; the
    declaration lives in code). ``checks`` carries the verdict map as
    JSON with ``checks_passed`` pre-aggregated for WHERE clauses;
    commits that died before their post-write verdict amendment have
    ``checks = NULL`` and ``checks_passed = NULL`` (unknown), which
    is exactly the state :meth:`FeatureStore.materialize` refuses to
    serve as a memo hit."""
    rows: list[tuple] = []
    for name, view in store.views.items():
        for commit in store.store.history(name):
            meta = commit.user_metadata or {}
            checks = meta.get("checks")
            rows.append(
                (
                    name,
                    int(commit.version),
                    commit.mode,
                    int(commit.row_count),
                    datetime.fromtimestamp(commit.timestamp, tz=timezone.utc),
                    meta.get("fingerprint"),
                    json.dumps(checks, sort_keys=True)
                    if checks is not None
                    else None,
                    all(checks.values()) if checks else None,
                    ",".join(view.inputs) or None,
                    ",".join(view.entities) or None,
                )
            )
    return rows


def publish_registry(
    store: FeatureStore,
    url: str,
    *,
    table: str = "feature_registry",
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
) -> int:
    """Mirror the store's full commit history into the JDBC registry
    table, keyed on (view_name, version). Returns the number of rows
    published (0 publishes nothing and leaves the target untouched —
    a fresh store has no history to register)."""
    rows = registry_rows(store)
    if not rows:
        return 0
    df = store.spark.createDataFrame(rows, REGISTRY_SCHEMA)
    jdbc_upsert(
        df,
        url,
        table,
        ["view_name", "version"],
        user=user,
        password=password,
        driver=driver,
        column_types=REGISTRY_DDL_TYPES,
    )
    return len(rows)
