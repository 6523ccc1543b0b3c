"""End-to-end curation pipeline invariants — the composition tests
that individual operator oracles can't express: row accounting is
monotone, splits partition the survivors, no verified near-dup pair
survives, decontamination removes exactly the probe-overlapping
docs, and the whole flow is deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from feray_spark.catalog import load_table
from feray_spark.operators.dedup import minhash_lsh_pairs
from feray_spark.pipeline import curate_corpus
from tests.conftest import SF_DIR


def _docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_counts_monotone_and_splits_partition(spark):
    res = curate_corpus(_docs(spark))
    c = res.counts()
    assert c["raw"] >= c["gated"] >= c["deduped"] >= c["neardup_free"]
    assert c["neardup_free"] == c["clean"]  # no probes passed
    assert c["gated"] > 0 and c["packs"] > 0

    per_split = {
        r.split: r.n for r in
        res.split_docs.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(per_split.values()) == c["clean"]
    assert set(per_split) <= {"train", "val", "test"}
    assert per_split.get("train", 0) > per_split.get("val", 0)


def test_no_verified_neardup_pair_survives(spark):
    """Re-running the pair finder over the curated output must find
    nothing — the clustering keep-rule's end-to-end contract."""
    res = curate_corpus(_docs(spark))
    left = minhash_lsh_pairs(
        res.clean, "text", "doc_id", jaccard_threshold=0.5
    )
    assert left.count() == 0


def test_decontamination_drops_probe_overlaps_only(spark):
    """Using a surviving doc's own text as the benchmark probe must
    remove that doc (8-gram self-overlap) and leave the rest of the
    corpus untouched."""
    base = curate_corpus(_docs(spark))
    victim = base.clean.filter(
        F.size(F.split("text", " ")) >= 12
    ).select("doc_id", "text").first()
    res = curate_corpus(_docs(spark), probe_texts=[victim.text])
    clean_ids = {r.doc_id for r in res.clean.select("doc_id").collect()}
    base_ids = {r.doc_id for r in base.clean.select("doc_id").collect()}
    assert victim.doc_id not in clean_ids
    dropped = base_ids - clean_ids
    assert victim.doc_id in dropped
    # every dropped doc really shares an 8-gram with the probe: the
    # victim itself plus any doc embedding the same span — nothing
    # outside that overlap set may be touched
    probe_grams = set(
        zip(*[victim.text.lower().split()[i:] for i in range(8)])
    )
    for r in base.clean.filter(
        F.col("doc_id").isin([int(i) for i in dropped])
    ).collect():
        doc_grams = set(zip(*[r.text.lower().split()[i:] for i in range(8)]))
        assert doc_grams & probe_grams, r.doc_id


def test_pipeline_is_deterministic(spark):
    a = curate_corpus(_docs(spark))
    b = curate_corpus(_docs(spark))
    ids_a = sorted(r.doc_id for r in a.split_docs.select("doc_id").collect())
    ids_b = sorted(r.doc_id for r in b.split_docs.select("doc_id").collect())
    assert ids_a == ids_b
    packs_a = sorted(map(tuple, a.packs.collect()))
    packs_b = sorted(map(tuple, b.packs.collect()))
    assert packs_a == packs_b


def test_packs_respect_context_and_split_boundaries(spark):
    """A pack's token START stays inside its pack_id * ctx fence
    (docs may overflow the fence — a doc belongs to the pack holding
    its first token), and no pack mixes splits (the window is
    partitioned by (split, shard), so eval can never leak into a
    train pack)."""
    ctx = 256
    res = curate_corpus(_docs(spark), pack_ctx=ctx)
    rows = res.packs.collect()
    assert rows
    # (split, shard, pack_id) is the grain — no duplicate key rows
    keys = [(r.split, r.shard, r.pack_id) for r in rows]
    assert len(keys) == len(set(keys))
    # cumulative accounting per (split, shard): pack p starts at
    # cumsum(previous packs) and that start must be < (p+1)*ctx and
    # >= p*ctx for every non-empty pack
    from collections import defaultdict

    by_shard = defaultdict(list)
    for r in rows:
        by_shard[(r.split, r.shard)].append(r)
    for packs in by_shard.values():
        packs.sort(key=lambda r: r.pack_id)
        cum = 0
        for r in packs:
            assert r.pack_id * ctx <= cum < (r.pack_id + 1) * ctx, r
            cum += r.pack_tokens


def test_attrition_report_matches_stage_handles(spark):
    """The one-pass flagged funnel must report EXACTLY the counts the
    curate_corpus stage handles produce — the flag rewrite (shared
    window, left-anti flag) may change the plan, never a number."""
    from feray_spark.pipeline import attrition_report

    d = _docs(spark)
    res = curate_corpus(d)
    rows = {r.stage: r for r in attrition_report(d).collect()}
    assert set(rows) == {"0_raw", "1_gated", "2_exact_dedup", "3_neardup_free"}
    c = res.counts()
    assert rows["0_raw"].n_docs == c["raw"]
    assert rows["1_gated"].n_docs == c["gated"]
    assert rows["2_exact_dedup"].n_docs == c["deduped"]
    assert rows["3_neardup_free"].n_docs == c["neardup_free"]
    # token accounting: monotone non-increasing down the funnel
    toks = [rows[s].n_tokens for s in
            ["0_raw", "1_gated", "2_exact_dedup", "3_neardup_free"]]
    assert toks[0] >= toks[1] >= toks[2] >= toks[3] > 0
