#!/usr/bin/env bash
# Run the DeltaTableStore contract-twin legs on a Delta-equipped box.
#
# This image ships without delta-spark, so the 14 `delta`-parametrized
# legs in tests/test_store_contract.py report as SKIPPED here. The
# contract parity claim (segment-log TableStore == real Delta under
# one assertion suite, SURVEY S2/S3) is only continuously exercised
# where the jars exist — this script is that leg, runnable verbatim
# in CI or on any dev machine with network access:
#
#   bash scripts/run_delta_twin.sh
#
# What it does:
#   1. installs delta-spark matched to the installed pyspark major
#      (pyspark 4.x -> delta-spark 4.x; see
#      https://docs.delta.io/latest/releases.html for the matrix);
#   2. points pytest at a Delta-extension SparkSession via
#      FERAY_SPARK_EXTRA_CONF (conftest.py forwards it into the
#      builder; the SQL extension is a STATIC conf and cannot be
#      added to an existing session);
#   3. runs the store-contract suite and FAILS if any delta leg
#      skipped — 0 skips is the done-criterion.
set -euo pipefail
cd "$(dirname "$0")/.."

PYSPARK_VER=$(python -c "import pyspark; print(pyspark.__version__.split('.')[0])")
case "$PYSPARK_VER" in
  4) DELTA_SPEC="delta-spark>=4.0,<5" ;;
  3) DELTA_SPEC="delta-spark>=3.2,<4" ;;
  *) echo "unsupported pyspark major $PYSPARK_VER" >&2; exit 1 ;;
esac
# offline fallback: an operator who cannot give this box network can
# instead drop the pinned wheel(s) into scripts/delta_twin_env/wheels/
# (EXPECTED.md ask-list) — prefer that directory when it exists
WHEELS_DIR="scripts/delta_twin_env/wheels"
if [ -d "$WHEELS_DIR" ] && ls "$WHEELS_DIR"/*.whl >/dev/null 2>&1; then
  pip install --quiet --no-index --find-links "$WHEELS_DIR" "$DELTA_SPEC"
else
  pip install --quiet "$DELTA_SPEC"
fi

# the pip package carries the version pin; the jars resolve from
# maven at session start via spark.jars.packages (scala 2.13 for
# pyspark 4, 2.12 for pyspark 3)
DELTA_VER=$(python -c "import importlib.metadata as m; print(m.version('delta-spark'))")
SCALA=$([ "$PYSPARK_VER" = 4 ] && echo 2.13 || echo 2.12)
export FERAY_SPARK_EXTRA_CONF="{
  \"spark.jars.packages\": \"io.delta:delta-spark_${SCALA}:${DELTA_VER}\",
  \"spark.sql.extensions\": \"io.delta.sql.DeltaSparkSessionExtension\",
  \"spark.sql.catalog.spark_catalog\": \"org.apache.spark.sql.delta.catalog.DeltaCatalog\",
  \"spark.databricks.delta.properties.defaults.enableChangeDataFeed\": \"true\"
}"

# criterion 1 (scripts/delta_twin_env/EXPECTED.md): the committed
# manifest of delta legs must match what the suite still collects —
# a renamed/removed leg fails HERE instead of silently shrinking the
# twin claim's coverage. The pipeline runs under `|| true` so that a
# zero-match grep or a pytest collection error reaches the diff's
# diagnostic instead of being killed silently by pipefail; collection
# stderr is kept for that same diagnosis.
(python -m pytest tests/test_store_contract.py --collect-only -q \
  | grep '\[delta\]' | sort > /tmp/delta_legs_now.txt) || true
sort scripts/delta_twin_env/delta_legs.txt > /tmp/delta_legs_expected.txt
if ! diff -u /tmp/delta_legs_expected.txt /tmp/delta_legs_now.txt; then
  echo "FAIL: collected delta legs differ from scripts/delta_twin_env/delta_legs.txt" >&2
  echo "      (an empty 'now' side means collection errored or found no" >&2
  echo "      [delta] legs at all; regenerate the manifest per EXPECTED.md" >&2
  echo "      and commit it)" >&2
  exit 1
fi

# criterion 2: 0 skipped, 0 failed — every leg ran against real Delta
python -m pytest tests/test_store_contract.py -q -rs | tee /tmp/delta_twin.out
if grep -qi "skipped" /tmp/delta_twin.out; then
  echo "FAIL: delta twin legs skipped — extension/jars not active" >&2
  exit 1
fi

# criterion 3: a committable record of the green run
{
  echo "# Last real-Delta contract-twin run"
  echo
  echo "- date: $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo "- pyspark: $(python -c 'import pyspark; print(pyspark.__version__)')"
  echo "- delta-spark: ${DELTA_VER}"
  echo "- legs: $(wc -l < scripts/delta_twin_env/delta_legs.txt) delta + shared"
  echo "- summary: $(tail -1 /tmp/delta_twin.out)"
} > scripts/delta_twin_env/LAST_RUN.md
echo "delta twin: all contract legs ran against real Delta"
echo "record written to scripts/delta_twin_env/LAST_RUN.md — commit it"
