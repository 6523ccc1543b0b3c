"""Dirty-data parity: manufactured edge rows through BOTH engines.

The oracle-gated catalog is only as strong as the fixtures it runs
on — the driver's tables carry no NULL keys, no empty arrays, no
negative quantities, no duplicate event ids. Each test here clones
the fixture set, injects exactly the edge rows a 100 TB corpus WILL
contain, and re-runs the full cross-engine parity assertion on the
affected queries. These pin the fixes for the round-6 latent-edge
review findings:

- empty / NULL embeddings (DuckDB ``list_reduce`` raises on empty;
  Spark legacy ``size(NULL)`` is -1 vs DuckDB NULL),
- out-of-domain math (DuckDB raises on sqrt/ln/log10 of negatives
  and zero; Spark yields NaN/NULL) and %-vs-pmod sign semantics,
- NULL keys through ASC orderings (Spark bare ASC is NULLS FIRST,
  DuckDB's is NULLS LAST) in o1/w2/a14,
- NULL user_id through t6's pandas fold (NaN group key must emerge
  as a true NULL, never a garbage long),
- (event_id, ts) ties with different payloads through t5's dedup
  (deterministic md5 payload surrogate on both sides).
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from feray_spark.queries import load_all
from tests.oracle_utils import assert_parity

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

_TS = datetime.datetime


def _edge_rows(sf_dir: str) -> dict[str, list[dict]]:
    # an existing priority so the NULL-price rows shift ranks inside
    # a REAL partition rather than forming their own
    prio = (
        pq.read_table(
            os.path.join(sf_dir, "orders.parquet"), columns=["o_orderpriority"]
        )
        .column(0)[0]
        .as_py()
    )
    return {
        "events": [
            # NULL user_id (t6's NaN-group-key edge; two rows so the
            # NULL group exercises last_event_type ordering too, and
            # a -0.005 value exercises half-up cents on negatives)
            dict(event_id=900001, ts=_TS(1999, 1, 1), user_id=None,
                 event_type="junk", value=1.23, props=None),
            dict(event_id=900003, ts=_TS(1999, 1, 2), user_id=None,
                 event_type="junk2", value=-0.005, props=None),
            # exact (event_id, ts) tie with DIFFERENT payloads — the
            # t5 dedup winner must be deterministic in both engines
            dict(event_id=900002, ts=_TS(1999, 1, 3), user_id=7,
                 event_type="zzz", value=1.0, props=None),
            dict(event_id=900002, ts=_TS(1999, 1, 3), user_id=3,
                 event_type="aaa", value=2.0, props=None),
            # malformed and valid-but-non-object JSON props (DuckDB's
            # json fns raise on the former and return [] keys on the
            # latter; Spark's from_json yields NULL for both)
            dict(event_id=900004, ts=_TS(1999, 1, 4), user_id=11,
                 event_type="junk3", value=0.0, props="not json"),
            dict(event_id=900005, ts=_TS(1999, 1, 5), user_id=11,
                 event_type="junk4", value=0.0, props="5"),
            # NULL event time: F.window drops it, bare ASC orderings
            # seat it at opposite ends of the two engines, and string
            # k='3.7' / k='abc' exercise the value-type cast pins
            dict(event_id=900006, ts=None, user_id=11,
                 event_type="junk5", value=1.0, props='{"k":"3.7"}'),
            dict(event_id=900007, ts=None, user_id=None,
                 event_type=None, value=None, props='{"k":"abc"}'),
            # exponent-form numeric string: the double-first cast
            # route (util.trunc_int32 / TRY_CAST(trunc(...))) must
            # yield 1000 on BOTH sides — Spark's direct string->int
            # cast would reject it while DuckDB's accepts
            dict(event_id=900008, ts=_TS(1999, 1, 6), user_id=12,
                 event_type="junk6", value=0.5, props='{"k":"1e3"}'),
            # grammar-edge numeric strings (util.PORTABLE_DOUBLE_RE):
            # '1.5d' parses only on Spark/Java, '1_000' only on
            # DuckDB — the shared grammar guard must NULL both on
            # both engines
            dict(event_id=900009, ts=_TS(1999, 1, 7), user_id=12,
                 event_type="junk7", value=0.5, props='{"k":"1.5d"}'),
            dict(event_id=900010, ts=_TS(1999, 1, 8), user_id=13,
                 event_type="junk8", value=0.5, props='{"k":"1_000"}'),
            # 64-bit overflow corners (util.trunc_int64): both pass
            # the portable grammar and parse to a double, but Spark's
            # non-ANSI double->bigint cast CLAMPS 1e20 (finite,
            # > 2^63) and 1e999 (Infinity — an isnan guard misses it)
            # to LONG_MAX where DuckDB's TRY_CAST yields NULL
            dict(event_id=900011, ts=_TS(1999, 1, 9), user_id=13,
                 event_type="junk9", value=0.5, props='{"k":"1e20"}'),
            dict(event_id=900012, ts=_TS(1999, 1, 10), user_id=13,
                 event_type="junk10", value=0.5, props='{"k":"1e999"}'),
        ],
        "orders": [
            dict(o_orderkey=999001, o_custkey=1, o_orderstatus=None,
                 o_totalprice=None, o_orderdate=_TS(1997, 1, 1),
                 o_orderpriority=prio),
            dict(o_orderkey=999002, o_custkey=1, o_orderstatus="F",
                 o_totalprice=None, o_orderdate=_TS(1997, 1, 2),
                 o_orderpriority=prio),
        ],
        "lineitem": [
            # negative quantity (sqrt domain + % sign), zero price
            # (ln/log10 domain), negative discount (sign/abs)
            dict(l_orderkey=999001, l_partkey=1, l_suppkey=1,
                 l_linenumber=1, l_quantity=-3.0, l_extendedprice=0.0,
                 l_discount=-0.02, l_tax=0.0, l_returnflag="X",
                 l_linestatus="X", l_shipdate=_TS(1997, 2, 1)),
        ],
        "embeddings": [
            dict(vec_id=999001, embedding=[], label=0),
            dict(vec_id=999002, embedding=None, label=0),
        ],
        "documents": [
            # NULL everything — the junk row every web crawl contains
            dict(doc_id=999001, text=None, lang=None, source=None,
                 n_chars=None),
            # empty and single-token texts (zero word counts, no
            # shingles, zero-length chunks)
            dict(doc_id=999002, text="", lang="en", source="edge",
                 n_chars=0),
            dict(doc_id=999003, text="x", lang="xx", source="edge",
                 n_chars=1),
            # an exact-duplicate pair from different sources — dedup
            # winner rules must pick deterministically
            dict(doc_id=999004, text="dup text dup text", lang="en",
                 source="edgeA", n_chars=17),
            dict(doc_id=999005, text="dup text dup text", lang="en",
                 source="edgeB", n_chars=17),
            # unicode case-folding edges: İ (Java lower emits
            # 'i'+combining-dot, utf8proc plain 'i') and the Greek
            # final sigma (Java context-sensitive ς, utf8proc σ) —
            # pinned by canon_lower / _canon_lower_sql on both sides
            dict(doc_id=999006,
                 text="CafÉ İstanbul STRASSE ß ΑΣ ΤΕΛΟΣ ςigma",
                 lang="tr", source="edge", n_chars=38),
            # unicode whitespace vs Java's ASCII-only \s, regex
            # metacharacters, CJK (no spaces), control whitespace
            dict(doc_id=999007,
                 text="nbsp ideographic　zero​width regex []()*+?^$|\\ "
                      "汉字テスト\tmixed汉words字here\r\n",
                 lang="xx", source="edge", n_chars=70),
            # decimal-string source suffix: l17's weight parse must
            # TRUNCATE '3.7' to 3 on both sides (Spark's direct
            # string->int cast truncates where DuckDB's TRY_CAST
            # rounds to 4 — pinned by the shared double-first route)
            dict(doc_id=999008, text="decimal suffix source row",
                 lang="en", source="src3.7", n_chars=25),
            # grammar-edge suffixes: Java-only float suffix and
            # DuckDB-only underscore separator — both must fall out
            # of the shared grammar (weight -> the coalesce 0)
            dict(doc_id=999009, text="java float suffix source row",
                 lang="en", source="src1.5d", n_chars=28),
            dict(doc_id=999010, text="underscore separator source row",
                 lang="en", source="src1_000", n_chars=31),
        ],
    }


@pytest.fixture(scope="module")
def dirty_sf_dir(tmp_path_factory, sf_dir) -> str:
    root = tmp_path_factory.mktemp("sf_dirty")
    extra = _edge_rows(sf_dir)
    for t in TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        rows = extra.get(t)
        if rows:
            add = pa.Table.from_pylist(rows, schema=tbl.schema)
            tbl = pa.concat_tables([tbl, add])
        pq.write_table(tbl, str(root / f"{t}.parquet"))
    return str(root)


# The WHOLE catalog runs on the dirty clone (the test_empty_inputs
# discipline, lifted from well-defined to value-correct): ~2 min at
# suite settings, and it is the only net that catches the next
# "DuckDB raises where Spark folds" or NULLS-FIRST edge the moment a
# new entry registers.
@pytest.mark.parametrize("name", sorted(load_all()))
def test_edge_rows_keep_cross_engine_parity(spark, dirty_sf_dir, name):
    assert_parity(spark, dirty_sf_dir, load_all()[name])
