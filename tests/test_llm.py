"""Unit tests for the LLM-data-pipeline operators (SURVEY §2.12) that
the DuckDB differential suite can't fully express: SimHash Hamming
behavior, LSH recall vs brute force, multimodal mapInPandas plumbing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feray_spark.catalog import load_table
from feray_spark.multimodal import attach_media, extract_media_features, fake_decode
from tests.conftest import SF_DIR
from feray_spark.operators.dedup import exact_dedup, minhash_lsh_pairs, simhash
from feray_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_bucketed_topk,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep dark forest to find a quiet place to sleep for a while"
)


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_simhash_near_dup_hamming(spark):
    """Near-identical docs land within a few bits; unrelated docs far."""
    near = BASE.replace("quiet", "silent")
    other = (
        "completely different content about database engines columnar "
        "storage vectorized execution and distributed query planning at scale"
    )
    df = spark.createDataFrame(
        [(1, BASE), (2, near), (3, other)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["simhash"] for r in simhash(df, "text", "doc_id").collect()}
    assert _hamming(rows[1], rows[2]) <= 12
    assert _hamming(rows[1], rows[3]) >= 16
    assert _hamming(rows[1], rows[2]) < _hamming(rows[1], rows[3])


def test_exact_dedup_keeps_lowest_id(spark):
    df = spark.createDataFrame(
        [(5, "same text"), (2, "same text"), (9, "unique")],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in exact_dedup(df, "text", "doc_id").collect())
    assert kept == [2, 9]


def test_minhash_lsh_finds_planted_pair(spark):
    near = BASE + " extra trailing words appended"
    other = (
        "completely different content about database engines columnar "
        "storage vectorized execution and distributed query planning"
    )
    df = spark.createDataFrame(
        [(1, BASE), (2, near), (3, other)], "doc_id long, text string"
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            df, "text", "doc_id", num_hashes=12, bands=4, jaccard_threshold=0.5
        ).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_lsh_topk_recall_vs_brute_force(spark, sf_dir):
    """The ANN path must recover most of the exact top-3 at sf0.001."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = e.select(F.col("vec_id").alias("c_id"), "embedding")
    exact = {
        (r["q_id"], r["c_id"])
        for r in brute_force_topk(queries, corpus, k=3).collect()
    }
    approx = {
        (r["q_id"], r["c_id"])
        for r in lsh_bucketed_topk(queries, corpus, k=3).collect()
    }
    assert exact, "no queries selected"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"LSH recall too low: {recall:.2f}"


def test_ivf_topk_recall_vs_brute_force(spark, sf_dir):
    """The IVF path must recover most of the exact top-3 at sf0.001."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = e.select(F.col("vec_id").alias("c_id"), "embedding")
    exact = {
        (r["q_id"], r["c_id"])
        for r in brute_force_topk(queries, corpus, k=3).collect()
    }
    approx = {
        (r["q_id"], r["c_id"])
        for r in ivf_topk(queries, corpus, k=3, centroid_stride=10, nprobe=8).collect()
    }
    assert exact, "no queries selected"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall too low: {recall:.2f}"


def test_multimodal_extract_with_fake_decoder(spark):
    df = spark.createDataFrame(
        [(1, b"\x10payload-one\x05"), (2, b"\x40payload-two\x21")],
        "doc_id long, payload binary",
    )
    feats = extract_media_features(
        attach_media(df, "payload", "image/png"), decoder=fake_decode
    )
    rows = {r["doc_id"]: r for r in feats.collect()}
    assert rows[1]["mime"] == "image/png"
    assert rows[1]["n_bytes"] == 13
    assert rows[1]["width"] == 1 + 0x10 % 64
    assert rows[1]["height"] == 1 + 0x05 % 64
    import hashlib

    assert rows[2]["payload_sha256"] == hashlib.sha256(b"\x40payload-two\x21").hexdigest()


def test_decode_image_rejects_unknown_format(spark):
    """decode_image is real header parsing for PNG/JPEG/GIF/BMP/
    netpbm (tests/test_multimodal.py); anything else must raise, not
    guess."""
    import pytest

    from feray_spark.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"anything")


def test_frame_sampling_with_fake_chunker(spark):
    from feray_spark.multimodal import attach_media, fake_chunk_frames, sample_frames

    df = spark.createDataFrame(
        [(1, bytes(range(100))), (2, b"xy")], "doc_id long, payload binary"
    )
    frames = sample_frames(
        attach_media(df, "payload", "video/fake"),
        every=2,
        frame_extractor=lambda d: fake_chunk_frames(d, frame_size=32),
    ).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 100 bytes -> frames 0..3 (32,32,32,4 bytes); every=2 keeps 0,2
    kept = sorted(r["frame_idx"] for r in by_doc[1])
    assert kept == [0, 2]
    f0 = next(r for r in by_doc[1] if r["frame_idx"] == 0)
    assert bytes(f0["frame_bytes"]) == bytes(range(32))
    # doc 2: single short frame, always kept
    assert [r["frame_idx"] for r in by_doc[2]] == [0]
    assert bytes(by_doc[2][0]["frame_bytes"]) == b"xy"


def test_resize_with_fake_resizer(spark):
    from feray_spark.multimodal import attach_media, fake_resize, resize_media

    df = spark.createDataFrame([(1, b"abc")], "doc_id long, payload binary")
    out = resize_media(
        attach_media(df, "payload", "image/png"), 4, 2, resizer=fake_resize
    ).collect()[0]
    assert out["width"] == 4 and out["height"] == 2
    assert bytes(out["media"]["data"]) == b"abcabcab"  # cycled to 4*2 bytes
    assert out["media"]["mime"] == "image/png"


def test_video_and_resize_reject_compressed_formats(spark):
    """The real paths cover netpbm payloads (tests/test_multimodal
    .py); compressed video/images still need a codec and must raise
    clearly rather than mis-decode."""
    import pytest

    from feray_spark.multimodal import extract_video_frames, resize_image

    with pytest.raises(NotImplementedError):
        extract_video_frames(b"")
    with pytest.raises(NotImplementedError):
        resize_image(b"", 1, 1)


def test_fixture_text_is_ascii(spark, sf_dir):
    """The l6b frame-sampling oracle slices VARCHAR where the engine
    slices bytes — sound only while fixture text stays ASCII."""
    d = load_table(spark, sf_dir, "documents")
    n = d.filter(F.length(F.encode("text", "UTF-8")) != F.length("text")).count()
    assert n == 0


def test_ann_paths_survive_empty_partitions(spark, sf_dir):
    """A corpus smaller than the partition count leaves empty Arrow
    batches in the scan — the numpy scoring paths must skip them, not
    np.stack an empty list."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 5)
    q = e.select(F.col("vec_id").alias("q_id"), "embedding")
    c = e.select(F.col("vec_id").alias("c_id"), "embedding")
    tiny = e.repartition(32)
    assert lsh_bucketed_topk(q, c.repartition(32), k=2).count() > 0
    assert ivf_topk(q, c.repartition(32), k=2, centroid_stride=2).count() > 0
    from feray_spark.operators.similarity import embedding_neardup_pairs

    # tau=-1: every pair qualifies, so output exists iff scoring ran
    assert embedding_neardup_pairs(tiny, id_col="vec_id", tau=-1.0).count() > 0


def test_ivf_kmeans_refinement_improves_quantization(spark, sf_dir):
    """The distributed Lloyd refinement must improve the quantizer's
    objective: average best-cosine of corpus vectors to their nearest
    centroid increases over the stride-sampled seed (recall parity on
    random fixtures is covered by the l3c query's rows-only gate)."""
    import numpy as np

    from feray_spark.catalog import load_table
    from feray_spark.operators.similarity import _kmeans_refine

    e = load_table(spark, sf_dir, "embeddings")
    M = np.stack(e.select("embedding").toPandas()["embedding"].to_numpy())
    M = M.astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    seed = Mn[::45]

    def avg_best_cos(C):
        return float((Mn @ C.T).max(axis=1).mean())

    refined = _kmeans_refine(
        e.select("embedding"), seed, vec_col="embedding", iters=2
    )
    assert avg_best_cos(refined) > avg_best_cos(seed) + 0.01


def test_audio_feature_extraction_deterministic(spark, sf_dir):
    """L6 audio: the mapInPandas extractor emits one row per payload
    with decoder-derived values, stable across partitionings."""
    from feray_spark.catalog import load_table
    from feray_spark.multimodal import (
        attach_media,
        extract_audio_features,
        fake_decode_audio,
    )

    d = load_table(spark, sf_dir, "documents").limit(50)
    m = attach_media(
        d.withColumn("payload", F.encode("text", "UTF-8")), "payload", "audio/wav"
    )
    one = extract_audio_features(m.coalesce(1), decoder=fake_decode_audio)
    many = extract_audio_features(m.repartition(7), decoder=fake_decode_audio)
    a = sorted(map(tuple, one.collect()))
    b = sorted(map(tuple, many.collect()))
    assert a == b and len(a) == 50
    for row in a:
        assert row[3] in (0, 8000, 16000, 44100)  # sample_rate
        assert row[4] >= 0.0 and 0.0 <= row[5] <= 1.0  # duration, rms


def test_connected_components_chain_and_cliques(spark):
    """Label propagation converges past diameter-1: a 5-node chain
    (diameter 4), a triangle, and an isolated pair all resolve to
    min-id components."""
    from feray_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        # chain 10-11-12-13-14, triangle 20-21-22, pair 30-31
        [(10, 11), (11, 12), (12, 13), (13, 14),
         (20, 21), (21, 22), (20, 22),
         (30, 31)],
        "id_a long, id_b long",
    )
    got = {(r.id, r.comp) for r in connected_components(pairs).collect()}
    want = {(i, 10) for i in (10, 11, 12, 13, 14)}
    want |= {(i, 20) for i in (20, 21, 22)}
    want |= {(30, 30), (31, 30)}
    assert got == want


def test_ann_broadcast_and_join_paths_agree(spark, sf_dir):
    """The small-query broadcast scan and the big-query join shapes
    implement the SAME candidate semantics (LSH: bucket collisions;
    IVF: probed cells) with the same deterministic tie-break — their
    top-k outputs must be identical row-for-row."""
    from feray_spark.catalog import load_table
    from feray_spark.operators.similarity import ivf_topk, lsh_bucketed_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    c = e.select(F.col("vec_id").alias("c_id"), "embedding")

    def rows(df):
        return sorted(
            (r.q_id, r.c_id, r.rank, round(r.cosine, 9)) for r in df.collect()
        )

    lsh_b = lsh_bucketed_topk(q, c, k=3, broadcast_queries=True)
    lsh_j = lsh_bucketed_topk(q, c, k=3, broadcast_queries=False)
    assert rows(lsh_b) == rows(lsh_j)

    ivf_b = ivf_topk(q, c, k=3, broadcast_queries=True)
    ivf_j = ivf_topk(q, c, k=3, broadcast_queries=False)
    assert rows(ivf_b) == rows(ivf_j)


def test_connected_components_star_equals_label_prop(spark):
    """large-star/small-star must produce the identical component
    assignment as label propagation on random graphs — chains,
    cliques, forests, and dense blobs alike."""
    import random

    from feray_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(7)
    for trial in range(4):
        n = rng.randint(5, 30)
        n_edges = rng.randint(n // 2, n * 2)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(n_edges)
        ]
        # self-pairs stay in: both variants must emit a node that appears
        # only as (a, a) as its own singleton component
        edges.append((n, n))
        if not edges:
            continue
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        lp = {(r.id, r.comp) for r in connected_components(pairs, max_iters=50).collect()}
        st = {(r.id, r.comp) for r in connected_components_star(pairs).collect()}
        assert lp == st, f"trial {trial}: {sorted(lp)} != {sorted(st)}"


def test_connected_components_chain_exceeding_max_iters_falls_back(spark):
    """A chain whose diameter exceeds max_iters must NOT return the
    still-moving (wrong) labels: the operator warns and falls through
    to the star variant, which is correct on any topology."""
    import pytest as _pytest

    from feray_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(12)]  # diameter 12
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    with _pytest.warns(RuntimeWarning, match="did not converge"):
        labels = connected_components(pairs, max_iters=2).collect()
    assert {(r.id, r.comp) for r in labels} == {(i, 0) for i in range(13)}


def test_ivf_cell_plan_bounded_at_any_corpus_size():
    """The derived IVF cell count must stay bounded (driver collect +
    broadcast are O(max_cells), never O(n)) from fixture scale up to
    100×-fixture and billion-vector corpora."""
    from feray_spark.operators.similarity import _ivf_cell_plan

    for n in (500, 2_000, 200_000, 10**9, 10**11):
        cells, stride = _ivf_cell_plan(n)
        assert 8 <= cells <= 65_536, (n, cells)
        assert stride >= 1
        # stride actually lands ~cells seeds for dense ids
        assert n // stride <= 2 * cells + 8, (n, cells, stride)
    # explicit target respected and still capped
    cells, _ = _ivf_cell_plan(10**9, target_cells=1024)
    assert cells == 1024
    cells, _ = _ivf_cell_plan(10**9, target_cells=10**8)
    assert cells == 65_536


def test_ivf_topk_default_derived_cells(spark, sf_dir):
    """ivf_topk with no explicit stride (the l3c path) derives a
    bounded cell count from the corpus and still finds neighbors."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    c = e.select(F.col("vec_id").alias("c_id"), "embedding")
    got = ivf_topk(q, c, k=3).collect()
    assert len(got) > 0
    assert all(r.rank <= 3 for r in got)


def test_embedding_neardup_guard_switches_to_bucketed(spark, sf_dir):
    """Past max_index_rows the exact broadcast path must hand off to
    the LSH-bucketed plan: output is a subset of the exact pairs
    (approximate recall, identical scores) and recall on the fixture
    band stays high."""
    from feray_spark.operators.similarity import embedding_neardup_pairs

    e = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_neardup_pairs(e, id_col="vec_id", tau=0.4).collect()
    }
    bucketed = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_neardup_pairs(
            e, id_col="vec_id", tau=0.4, max_index_rows=10
        ).collect()
    }
    assert set(bucketed) <= set(exact)
    assert len(bucketed) >= 0.5 * len(exact), (len(bucketed), len(exact))
    for pair, cos in bucketed.items():
        assert abs(cos - exact[pair]) < 1e-9


def test_incremental_neardup_matches_replayed_rule(spark, sf_dir):
    """L18b end-to-end invariant: the two-batch stateful run through
    the table store must equal a sequential replay of the documented
    pessimistic one-pass rule (band collision + signature-estimated
    Jaccard >= 0.5, smaller id wins, index = previously ACCEPTED
    docs) over the same md5-deterministic signatures."""
    import hashlib

    from feray_spark.catalog import load_table
    from feray_spark.operators.dedup import minhash_signatures
    from feray_spark.queries import load_all

    d = load_table(spark, sf_dir, "documents")
    sigs = {
        r.doc_id: list(r.sig)
        for r in minhash_signatures(d, "text", "doc_id").collect()
    }

    def bandhashes(sig):
        return [
            hashlib.md5(f"{sig[2 * b]}|{sig[2 * b + 1]}".encode()).hexdigest()
            for b in range(4)
        ]

    def estj(a, b):
        return sum(x == y for x, y in zip(a, b)) / 8.0

    accepted: dict[int, int] = {}
    index_bands: dict[tuple[int, str], list[int]] = {}
    for tag in (0, 1):
        batch_ids = sorted(i for i in sigs if i % 2 == tag)
        bb = {i: bandhashes(sigs[i]) for i in batch_ids}
        for i in batch_ids:
            coll = set()
            for bi, bh in enumerate(bb[i]):
                coll |= set(index_bands.get((bi, bh), []))
            for j in batch_ids:
                if j >= i:
                    break
                if any(bb[j][bi] == bb[i][bi] for bi in range(4)):
                    coll.add(j)
            if any(estj(sigs[i], sigs[j]) >= 0.5 for j in coll):
                continue  # dropped
            accepted[i] = tag
        for i in batch_ids:
            if i in accepted:
                for bi, bh in enumerate(bb[i]):
                    index_bands.setdefault((bi, bh), []).append(i)

    got = {
        (r.doc_id, r.ingest_batch)
        for r in load_all()["l18b_incremental_neardup"].fn(spark, sf_dir).collect()
    }
    assert got == set(accepted.items())
    # and it actually dropped something (the fixtures carry near-dup
    # families), else the invariant is vacuous
    assert len(got) < len(sigs)


def test_exact_scan_topk_matches_fold_twin(spark, sf_dir):
    """The vectorized matmul tier must agree with the bit-exact fold
    twin on ranks exactly and on cosines within the documented ulp
    band (fixture neighbors are well-separated, so the rank-flip
    caveat cannot trigger here)."""
    from feray_spark.catalog import load_table
    from feray_spark.operators.similarity import (
        brute_force_topk,
        exact_scan_topk,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    c = e.select(F.col("vec_id").alias("c_id"), "embedding")
    fold = {(r.q_id, r.rank): (r.c_id, r.cosine)
            for r in brute_force_topk(q, c, k=3).collect()}
    vec = {(r.q_id, r.rank): (r.c_id, r.cosine)
           for r in exact_scan_topk(q, c, k=3).collect()}
    assert set(fold) == set(vec)
    for key, (cid, cos) in fold.items():
        vcid, vcos = vec[key]
        assert vcid == cid
        assert abs(vcos - cos) < 1e-9


def test_semantic_dedup_keep_rule_and_bucketing(spark):
    """L24: within a sign-bucket, every cosine-≥-τ duplicate of a
    smaller id is dropped (lowest id survives); near-dups split
    across buckets are the documented recall miss, not a drop."""
    from feray_spark.operators.dedup import semantic_dedup

    rows = [
        # bucket '10...': 1 and 2 are near-identical -> 2 drops
        (1, [1.0, -1.0, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1]),
        (2, [1.0, -1.0, 0.1, 0.1, 0.1, 0.1, 0.1, 0.11]),
        # same bucket, orthogonal-ish to 1 -> kept
        (3, [0.1, -1.0, 1.0, -0.9, 0.5, 0.1, 0.1, 0.1]),
        # near-identical to 1 but component 2 flips sign -> other
        # bucket -> KEPT (boundary miss by design)
        (4, [1.0, 0.0001, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1]),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id int, embedding array<float>",
    )
    kept = semantic_dedup(df, id_col="vec_id", vec_col="embedding", tau=0.9)
    got = {r.vec_id for r in kept.collect()}
    assert got == {1, 3, 4}
    # deterministic: same input, same keep-list
    again = {r.vec_id
             for r in semantic_dedup(df, id_col="vec_id",
                                     vec_col="embedding", tau=0.9).collect()}
    assert again == got


class TestBPE:
    def test_classic_corpus_merges(self):
        """Sennrich's worked example shape: repeated subwords merge
        first, deterministically."""
        from feray_spark.functions.bpe import EOW, learn_bpe

        types = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        merges = learn_bpe(types, n_merges=4)
        assert len(merges) == 4
        # 'es' (9) then 'est' (9) then 'est</w>' dominate the classic corpus
        assert merges[0] == ("e", "s")
        assert merges[1] == ("es", "t")
        assert merges[2] == ("est", EOW)

    def test_encode_reconstructs_and_bounds(self):
        from feray_spark.functions.bpe import EOW, encode_word, learn_bpe

        types = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        merges = learn_bpe(types, n_merges=10)
        ranks = {p: i for i, p in enumerate(merges)}
        for w, _ in types:
            toks = encode_word(w, ranks)
            assert "".join(toks) == w + EOW  # lossless
            assert 1 <= len(toks) <= len(w) + 1  # never worse than chars

    def test_learning_is_deterministic(self):
        from feray_spark.functions.bpe import learn_bpe

        types = [("abab", 3), ("baba", 3), ("aabb", 3)]
        assert learn_bpe(types, 5) == learn_bpe(list(reversed(types)), 5)

    def test_word_types_collect_is_hard_capped(self, spark):
        """The trainer's driver collect is bounded by construction:
        max_types wins regardless of how many distinct word types the
        corpus carries (web garbage breaks the Zipf assumption), the
        survivors are the most frequent, and ties resolve
        lexicographically so the vocabulary stays deterministic."""
        from feray_spark.functions.bpe import word_types

        # 500 distinct types, frequency ~ rank via repetition
        rows = [(f"w{i:03d} " * (i % 7 + 1),) for i in range(500)]
        df = spark.createDataFrame(rows, "text string")
        got = word_types(df, "text", max_types=25)
        assert len(got) == 25
        assert all(n == 7 for _, n in got)  # only the most frequent rank
        assert [w for w, _ in got] == sorted(w for w, _ in got)  # ties: lex
        # min_count prunes hapax types inside the aggregate
        pruned = word_types(df, "text", min_count=2, max_types=10_000)
        assert pruned and all(n >= 2 for _, n in pruned)

    def test_learn_bpe_refuses_unbounded_type_table(self):
        """The trainer's driver-side state is O(types x word length);
        a caller that skips word_types' cap must get a loud raise,
        never an OOM mid-merge (VERDICT r8 item 6)."""
        from feray_spark.functions.bpe import learn_bpe

        types = [(f"w{i}", 1) for i in range(11)]
        with pytest.raises(ValueError, match="max_types"):
            learn_bpe(types, 5, max_types=10)
        # at the bound it trains normally
        assert learn_bpe(types[:10], 5, max_types=10)

    def test_distributed_counts_match_local_encoding(self, spark, sf_dir):
        """The Arrow-batched counter must agree with driver-side
        encoding word-for-word on a sample."""
        from feray_spark.catalog import load_table
        from feray_spark.functions.bpe import (
            bpe_token_count,
            encode_word,
            learn_bpe,
            word_counts,
        )

        d = load_table(spark, sf_dir, "documents").limit(50)
        types = [(r["word"], r["n"]) for r in word_counts(d, "text").collect()]
        merges = learn_bpe(types, n_merges=20)
        ranks = {p: i for i, p in enumerate(merges)}
        got = d.select(
            "doc_id", "text", bpe_token_count("text", merges).alias("n")
        ).collect()
        for r in got:
            want = sum(
                len(encode_word(w, ranks)) for w in r.text.lower().split()
            )
            assert r.n == want
        # compression: merges can only shorten vs characters
        chars = {r.doc_id: len(r.text.replace(" ", "")) for r in got}
        for r in got:
            assert r.n <= chars[r.doc_id] + len(r.text.split())


def test_exact_dedup_keeps_null_texts_distinct(spark):
    """NULL texts are missing data, not byte-identical content: every
    NULL-text row survives exact_dedup."""
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None)],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in exact_dedup(df, "text", "doc_id").collect())
    assert kept == [1, 3, 4]


def test_doc_fingerprint_null_propagates(spark):
    """hash64/doc_fingerprint must yield NULL for NULL text, never the
    constant md5(seed) that concat_ws's NULL-skipping would produce —
    that constant would cluster every NULL doc as identical content."""
    from feray_spark.functions.text import doc_fingerprint

    df = spark.createDataFrame([(1, None), (2, "hello world")],
                               "doc_id long, text string")
    rows = {r.doc_id: r.fp for r in
            df.select("doc_id", doc_fingerprint("text").alias("fp")).collect()}
    assert rows[1] is None
    assert rows[2] is not None


def test_minhash_rejects_num_hashes_beyond_family(spark):
    from feray_spark.operators.dedup import minhash_bands

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="MINHASH_COEFFS"):
        minhash_bands(df, "text", "doc_id", num_hashes=32, bands=8)


def test_salted_join_rejects_reserved_salt_column(spark):
    from feray_spark.operators.skew import salted_join

    large = spark.createDataFrame([(1, 5)], "k long, __salt long")
    small = spark.createDataFrame([(1, "x")], "k long, v string")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(large, small, on=["k"])


def test_cosine_batch_mixed_dimensions_deterministic(spark):
    """Pairs are scored by their own length, never the Arrow batch's
    first row: a mixed-dimension table gets real cosines for every
    consistent pair and NULL only for ragged/NULL pairs — matching
    the sequential-fold twin regardless of row order."""
    from feray_spark.functions.vectors import (
        cosine_similarity,
        cosine_similarity_batch,
    )

    rows = [
        (1, [1.0, 0.0], [0.0, 1.0]),            # 2-d pair
        (2, [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]),  # 3-d pair (different dim)
        (3, [1.0, 0.0], [1.0, 0.0, 0.0]),       # ragged -> NULL
        (4, None, [1.0, 0.0]),                  # NULL vector -> NULL
    ]
    df = spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>"
    ).repartition(1)
    got = {
        r.id: r.c
        for r in df.select(
            "id", cosine_similarity_batch("a", "b").alias("c")
        ).collect()
    }
    want = {
        r.id: r.c
        for r in df.select(
            "id", cosine_similarity("a", "b").alias("c")
        ).collect()
    }
    for i in (1, 2, 3, 4):
        if want[i] is None:
            assert got[i] is None, i
        else:
            assert got[i] is not None and abs(got[i] - want[i]) < 1e-12, i


def test_grouped_partial_agg_validates_output_lengths(spark):
    from feray_spark.operators.grouped import grouped_partial_agg

    df = spark.createDataFrame([(1, 2.0)], "k long, v double")
    with pytest.raises(ValueError, match="out_names/out_types"):
        grouped_partial_agg(
            df, "k", "v", ("count", "min", "max"), out_types=("long", "double")
        )


def test_canonical_text_normalization_cases(spark):
    """canonical_text collapses exactly the variants L1b claims to
    merge (case, punctuation, whitespace runs, edge whitespace) and
    keeps NULL as NULL — not '' — so NULL texts never form a group."""
    from feray_spark.functions.text import canonical_text

    df = spark.createDataFrame(
        [
            (1, "Hello,  World!"),
            (2, "hello world"),
            (3, "\tHELLO\nworld  "),
            (4, "hello, world; but different"),
            (5, None),
            (6, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.canon
        for r in df.select(
            "doc_id", canonical_text("text").alias("canon")
        ).collect()
    }
    assert got[1] == got[2] == got[3] == "hello world"
    assert got[4] == "hello world but different"
    assert got[5] is None
    assert got[6] == ""


def test_l1b_canonical_dedup_winner_and_variant_count(spark, tmp_path):
    """End-to-end l1b semantics on a crafted corpus: variants that
    differ only by case/punct/whitespace collapse onto the lowest
    doc_id with the right n_variants; NULL texts each survive as
    their own single-variant group with NULL canon_md5."""
    from feray_spark.queries import load_all

    spark.createDataFrame(
        [
            (10, "The Quick! Brown fox", "en", "web"),
            (3, "the quick  brown-fox", "en", "web"),
            (7, "the  quick brown fox?", "de", "books"),
            (8, "something else", "en", "web"),
            (11, None, "en", "web"),
            (12, None, "en", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    ).withColumn("n_chars", F.length("text")).coalesce(1).write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    rows = {
        r.doc_id: r
        for r in load_all()["l1b_canonical_dedup"].fn(spark, str(tmp_path)).collect()
    }
    # 7 and 10 share "the quick brown fox"; 3's hyphen strips to
    # "brownfox" (punct is REMOVED, not spaced — "don't" → "dont"),
    # so it stays its own group
    assert sorted(rows) == [3, 7, 8, 11, 12]
    w = rows[7]  # lowest id of the merged group, keeps ITS lang/source
    assert w.n_variants == 2 and w.lang == "de" and w.source == "books"
    assert rows[3].n_variants == 1 and rows[8].n_variants == 1
    assert rows[11].n_variants == 1 and rows[11].canon_md5 is None
    assert rows[12].n_variants == 1 and rows[12].canon_md5 is None


#: canonicalization corner set: ASCII whitespace class members and
#: near-members (VT is in Java's \s but NOT in RE2's — the r10
#: divergence canonical_text now pins), C0/C1 controls, NBSP, the
#: İ/final-sigma case-fold edges, Kelvin sign, NULL/empty/ws-only
_CANON_CORNERS = [
    "a\x0bb", "a\tb", "a\nb", "a\x0cb", "a\rb", "a b",
    "x\x1fy", "a\x85b", "a\xa0b", "a\u2028b",
    "İstanbul", "ΑΣ ΤΕΛΟΣ ςigma", "K\u212aelvin",
    "  leading and trailing\t ", "\t \n", "", None,
    "don't stop-me now!!", "MiXeD 123  Case",
]


def test_canonical_text_paths_and_oracle_agree_on_corners(spark):
    """The THREE canonicalization legs — the Column expression, the
    mapInArrow/RE2 batch leg, and the DuckDB oracle `_CANON_SQL` —
    produce byte-identical output on the corner set. This is the pin
    that lets with_canonical_text switch legs by input size without
    parity risk (and the regression net for the r10 \\s/VT fix:
    Java's \\s contains U+000B, RE2's does not)."""
    import duckdb

    from feray_spark.functions.text import (
        _with_canonical_text_arrow,
        canonical_text,
    )
    from feray_spark.queries.llm import _CANON_SQL

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CANON_CORNERS)], "i long, text string"
    )
    col_rows = {
        r.i: r.c
        for r in df.select("i", canonical_text("text").alias("c")).collect()
    }
    arrow_rows = {
        r.i: r["__canon"]
        for r in _with_canonical_text_arrow(df, "text", "__canon").collect()
    }
    con = duckdb.connect()
    duck_rows = {
        i: con.sql(
            f"SELECT {_CANON_SQL} FROM (SELECT $1 AS text)", params=[t]
        ).fetchone()[0]
        for i, t in enumerate(_CANON_CORNERS)
    }
    for i, t in enumerate(_CANON_CORNERS):
        assert col_rows[i] == arrow_rows[i] == duck_rows[i], (
            i, repr(t), col_rows[i], arrow_rows[i], duck_rows[i]
        )


def test_l1b_arrow_leg_matches_column_leg_on_fixture(spark):
    """with_canonical_text's size gate keeps driver fixtures on the
    Column leg, so the Arrow leg needs its own differential run:
    canonical md5s over the whole sf0.01 corpus must be identical
    through both legs."""
    from feray_spark.functions.text import (
        _with_canonical_text_arrow,
        canonical_text,
    )

    d = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )
    a = {
        r.doc_id: r.m
        for r in _with_canonical_text_arrow(d, "text", "__canon")
        .select("doc_id", F.md5("__canon").alias("m"))
        .collect()
    }
    c = {
        r.doc_id: r.m
        for r in d.select(
            "doc_id", F.md5(canonical_text("text")).alias("m")
        ).collect()
    }
    assert a == c


def test_with_canonical_text_in_memory_frame_stays_on_column_leg(spark):
    """ADVICE r10: a literal in-memory frame (LocalRelation) has no
    files behind it, so the size gate reads 'unknown' — but it is
    driver-bounded (tiny), so it must take the Column leg, never pay
    the ~0.3 s mapInArrow worker round-trip. A LogicalRDD (e.g. a
    localCheckpoint boundary) deliberately keeps the Arrow leg — it
    can front a huge frame — and a UDT column survives that leg
    (mapInArrow converts UDTs via their sqlType on Spark 4)."""
    from pyspark.ml.linalg import Vectors

    from feray_spark.functions.text import with_canonical_text

    df = spark.sql(
        "SELECT * FROM VALUES (1, 'Hello, World!'), "
        "(2, CAST(NULL AS STRING)) AS t(i, text)"
    )
    out = with_canonical_text(df, "text", "__canon")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "MapInArrow" not in plan, plan
    rows = {r.i: r["__canon"] for r in out.collect()}
    assert rows == {1: "hello world", 2: None}

    # UDT frame: createDataFrame-with-UDT plans as LogicalRDD, takes
    # the Arrow leg, and must come back with the UDT intact
    udt = spark.createDataFrame(
        [(1, "Hello, World!", Vectors.dense([1.0, 2.0]))],
        ["i", "text", "vec"],
    )
    got = with_canonical_text(udt, "text", "__canon").collect()
    assert got[0]["__canon"] == "hello world"
    assert list(got[0]["vec"]) == [1.0, 2.0]

    # r11 review regression: an unknown-size frame that merely
    # CONTAINS a literal relation (big side joined with a VALUES
    # lookup) must KEEP the Arrow leg — the in-memory test inspects
    # plan LEAVES, never substring-matches the tree
    lookup = spark.sql("SELECT * FROM VALUES (1), (2) AS t(i)")
    big_side = spark.createDataFrame(
        [(1, "Mixed Plan!"), (2, "other")], ["i", "text"]
    )  # LogicalRDD leaf: size unknown, not literal
    mixed = big_side.join(lookup, "i")
    out2 = with_canonical_text(mixed, "text", "__canon")
    assert "MapInArrow" in out2._jdf.queryExecution().optimizedPlan().toString()
    assert {r["__canon"] for r in out2.collect()} == {"mixed plan", "other"}


def test_arrow_leg_matches_column_leg_on_dirty_fixture(spark, tmp_path):
    """ADVICE r10: the dirty-fixture parity sweep runs at fixture
    scale, where the size gate keeps everything on the Column leg —
    so the production Arrow leg (utf8proc lowercase vs Java lower)
    never saw the dirty unicode edges. Force it here: the Arrow and
    Column legs must agree byte-for-byte on the dirty documents
    clone (NULL text, empty text, İ/ς case-folding edges, unicode
    whitespace, regex metacharacters, CJK, control whitespace)."""
    from tests.test_dirty_edges import _edge_rows

    from feray_spark.functions.text import (
        _with_canonical_text_arrow,
        canonical_text,
    )

    rows = _edge_rows(SF_DIR)["documents"]
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    extra = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
    )
    # materialize to parquet so the Arrow leg runs over a real scan
    p = str(tmp_path / "dirty_docs.parquet")
    base.unionByName(extra).write.mode("overwrite").parquet(p)
    d = spark.read.parquet(p)
    a = {
        r.doc_id: r["__canon"]
        for r in _with_canonical_text_arrow(d, "text", "__canon").collect()
    }
    c = {
        r.doc_id: r.c
        for r in d.select("doc_id", canonical_text("text").alias("c")).collect()
    }
    assert a == c


def test_canonical_gate_takes_arrow_leg_past_threshold_and_matches_oracle(
    spark, tmp_path
):
    """VERDICT r10 item 2: the leg that actually runs at scale must
    be oracle-checked, not just corner-pinned. Build a >8 MB corpus
    (sf0.01 texts salted per replica with the unicode corner set so
    content varies), check the PUBLIC gate routes it through
    mapInArrow, and hash-compare every canonical form against the
    DuckDB `_CANON_SQL` twin over the same parquet."""
    import duckdb

    from feray_spark.functions.text import (
        CANON_ARROW_MIN_BYTES,
        with_canonical_text,
    )
    from feray_spark.queries.llm import _CANON_SQL
    from tests.test_llm import _CANON_CORNERS

    salt = " ".join(t for t in _CANON_CORNERS if t is not None)
    d = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )
    reps = spark.range(80).withColumnRenamed("id", "__r")
    # per-row sha chains make the salted text incompressible enough
    # that the written parquet actually crosses the byte gate
    chain = F.concat_ws(
        " ",
        *[
            F.sha2(
                F.concat_ws("|", F.col("doc_id"), F.col("__r"), F.lit(j)),
                256,
            )
            for j in range(8)
        ],
    )
    big = d.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") * 1000 + F.col("__r")).alias("doc_id"),
        F.concat_ws(" ", "text", F.lit(salt), chain).alias("text"),
    )
    p = str(tmp_path / "big_docs.parquet")
    big.write.mode("overwrite").parquet(p)
    import os

    total = sum(
        os.path.getsize(os.path.join(p, f))
        for f in os.listdir(p)
        if f.endswith(".parquet")
    )
    assert total > CANON_ARROW_MIN_BYTES, total

    scan = spark.read.parquet(p)
    out = with_canonical_text(scan, "text", "__canon")
    assert "MapInArrow" in out._jdf.queryExecution().optimizedPlan().toString()
    got = {
        r.doc_id: r.m
        for r in out.select(
            "doc_id", F.md5("__canon").alias("m")
        ).collect()
    }
    con = duckdb.connect()
    want = {
        i: m
        for i, m in con.sql(
            f"SELECT doc_id, md5({_CANON_SQL}) FROM read_parquet('{p}/*.parquet')"
        ).fetchall()
    }
    assert got == want


def test_exact_dedup_canonical_flag(spark):
    """canonical=True collapses case/punct/whitespace variants that
    byte-exact mode keeps; NULL texts still pass through untouched."""
    df = spark.createDataFrame(
        [(5, "Same, Text!"), (2, "same  text"), (9, None)],
        "doc_id long, text string",
    )
    byte_kept = sorted(
        r.doc_id for r in exact_dedup(df, "text", "doc_id").collect()
    )
    canon_kept = sorted(
        r.doc_id
        for r in exact_dedup(df, "text", "doc_id", canonical=True).collect()
    )
    assert byte_kept == [2, 5, 9]
    assert canon_kept == [2, 9]


def test_token_count_null_text_propagates(spark):
    """token_count/bpe_ish_token_count on NULL text must be NULL —
    never the non-ANSI legacy size() sentinel of -1, which silently
    DECREMENTS any sum it reaches while every DuckDB oracle twin
    skips the NULL. Locks the _null_safe_size contract."""
    from pyspark.sql import functions as F

    from feray_spark.functions.text import bpe_ish_token_count, token_count

    df = spark.createDataFrame([(None,), ("a b",)], "text string")
    assert [
        r.n for r in df.select(token_count("text").alias("n")).collect()
    ] == [None, 2]
    assert df.agg(F.sum(token_count("text"))).first()[0] == 2
    assert df.agg(F.sum(bpe_ish_token_count("text"))).first()[0] == 2


def test_simhash_empty_and_null_text_contract(spark):
    """l2b's oracle contract: zero-word text sketches to 0 (an empty
    majority vote sets no bits — both engines' fold initial state);
    NULL text yields NULL (dropped by the catalog query's gate)."""
    from feray_spark.operators.dedup import simhash

    df = spark.createDataFrame(
        [(1, ""), (2, " . "), (3, None), (4, "a b a")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.simhash for r in simhash(df, "text", "doc_id").collect()}
    assert out[1] == 0
    assert out[3] is None
    assert out[4] not in (0, None)


def test_similarity_empty_inputs_return_empty_typed(spark):
    """Empty corpus / empty query frames must yield empty TYPED
    results — never an opaque np.stack ValueError on the driver."""
    from feray_spark.operators.similarity import (
        embedding_neardup_pairs,
        exact_scan_topk,
    )

    empty_v = spark.createDataFrame([], "vec_id long, embedding array<double>")
    empty_q = spark.createDataFrame([], "q_id long, embedding array<double>")
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "c_id long, embedding array<double>"
    )
    assert embedding_neardup_pairs(empty_v, id_col="vec_id").count() == 0
    out = exact_scan_topk(empty_q, vecs, k=2)
    assert out.count() == 0


def test_neardup_pairs_string_ids(spark):
    """embedding_neardup_pairs must carry non-integer ids (string doc
    ids are the norm) — the output schema derives from the input id
    dtype instead of being hardcoded to long."""
    from feray_spark.operators.similarity import embedding_neardup_pairs

    vecs = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [1.0, 0.001]), ("c", [0.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    pairs = embedding_neardup_pairs(vecs, id_col="vec_id", tau=0.9).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {("a", "b")}


def test_brute_force_topk_masks_null_cosine(spark):
    """A zero-norm corpus vector has no defined cosine: it must not
    pad the top-k with NULL rows (exact_scan_topk masks those pairs;
    the fold twin must stay row-identical)."""
    from feray_spark.operators.similarity import brute_force_topk

    q = spark.createDataFrame([(1, [1.0, 0.0])], "q_id long, embedding array<double>")
    c = spark.createDataFrame(
        [(2, [1.0, 0.1]), (3, [0.0, 0.0])],  # 3 is zero-norm
        "c_id long, embedding array<double>",
    )
    rows = brute_force_topk(q, c, k=5).collect()
    assert [r.c_id for r in rows] == [2]
    assert all(r.cosine is not None for r in rows)


def test_span_valve_identical_on_planted_mega_span(spark):
    """L20 hot-span valve: a boilerplate span repeated past
    ``max_span_df`` is diverted off the rank window onto the
    aggregate/min-winner path — the keep flags must be IDENTICAL to
    the valve-off window semantics for every row (the mega-span keeps
    only its global (doc_id, pos) minimum; cold docs are untouched)."""
    from feray_spark.operators.dedup import span_first_occurrence_flags

    rows = []
    # 40 docs all containing the same boilerplate span at pos 0,
    # plus a unique span each at pos 1
    for d in range(40):
        rows.append((d, 0, "all rights reserved cookie banner"))
        rows.append((d, 1, f"unique body {d}"))
    # one cold duplicate pair below the valve bound
    rows.append((100, 0, "cold dup"))
    rows.append((101, 3, "cold dup"))
    spans = spark.createDataFrame(rows, "doc_id long, pos long, chunk string")

    base = {
        (r.doc_id, r.pos): r.keep
        for r in span_first_occurrence_flags(spans).collect()
    }
    valved = {
        (r.doc_id, r.pos): r.keep
        for r in span_first_occurrence_flags(spans, max_span_df=10).collect()
    }
    assert valved == base
    # unique_rows mode ((doc_id, pos) IS unique here, matching l20's
    # generator contract): the window-free hot path must produce the
    # same flags as both the dup-safe valve path and the base window
    unique = {
        (r.doc_id, r.pos): r.keep
        for r in span_first_occurrence_flags(
            spans, max_span_df=10, unique_rows=True
        ).collect()
    }
    assert unique == base
    # the mega-span's sole survivor is its global (doc_id, pos) min
    assert valved[(0, 0)] is True
    assert all(valved[(d, 0)] is False for d in range(1, 40))
    # cold rows: window semantics untouched
    assert valved[(100, 0)] is True and valved[(101, 3)] is False
    assert all(valved[(d, 1)] is True for d in range(40))
    # column contract: input columns + keep, in order
    out = span_first_occurrence_flags(spans, max_span_df=10)
    assert out.columns == ["doc_id", "pos", "chunk", "keep"]


def test_lsh_hot_bucket_valve_preserves_pairs(spark):
    """A degenerate band (here: many identical docs, colliding in
    every band) must not explode an O(B^2) struct array in one task —
    the valve diverts over-width buckets to an equi-self-join with
    IDENTICAL pair semantics. Valve on (tiny cap) == valve off."""
    docs = [(i, BASE) for i in range(30)] + [
        (100, "totally different content words altogether here"),
        (101, "totally different content words altogether here too"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    kw = dict(shingle_n=3, num_hashes=8, bands=4)
    valved = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            df, "text", "doc_id", max_bucket_ids=8, **kw
        ).collect()
    }
    unguarded = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            df, "text", "doc_id", max_bucket_ids=None, **kw
        ).collect()
    }
    assert valved == unguarded
    assert {(a, b) for a, b in valved if a < 30 and b < 30} == {
        (a, b) for a in range(30) for b in range(a + 1, 30)
    }


def test_incremental_bpe_trainer_matches_naive_recount():
    """The heap/index trainer must pick the EXACT same merge sequence
    as the naive recount-everything reference (max count, ties to the
    lexicographically smallest pair) — the optimization is
    bookkeeping, never a semantics change."""
    import random
    from collections import Counter

    from feray_spark.functions.bpe import EOW, learn_bpe

    def naive(types, n_merges):
        seqs = {}
        for w, n in types:
            if w:
                s = (*w, EOW)
                seqs[s] = seqs.get(s, 0) + int(n)
        merges = []
        for _ in range(n_merges):
            pairs = Counter()
            for s, n in seqs.items():
                for a, b in zip(s, s[1:]):
                    pairs[(a, b)] += n
            if not pairs:
                break
            top = max(pairs.values())
            best = min(p for p, c in pairs.items() if c == top)
            merges.append(best)
            merged = "".join(best)
            nxt = {}
            for s, n in seqs.items():
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                nxt[tuple(out)] = nxt.get(tuple(out), 0) + n
            seqs = nxt
        return merges

    rng = random.Random(13)
    alphabet = "abcdef"
    types = [
        (
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7))),
            rng.randint(1, 40),
        )
        for _ in range(300)
    ]
    for n_merges in (1, 5, 25, 80):
        assert learn_bpe(types, n_merges) == naive(types, n_merges)


def test_l5b_single_doc_corpus_parity(spark, tmp_path):
    """ADVICE r9 (medium): a one-document corpus — e.g. a one-row
    backfill window — gives every occupied hash slot df == m, so IDF
    weights the WHOLE vector to zero. The nnz_ok invariant must
    therefore be pinned on the TF vector (1 <= nnz <= n_tokens holds
    there by construction), not the TF-IDF vector, or Spark reports
    nnz_ok=false against the oracle's pinned TRUE. Full cross-engine
    parity on a cloned fixture whose documents table is ONE row."""
    import os
    import shutil

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from feray_spark.catalog import TABLES
    from feray_spark.queries import load_all
    from tests.oracle_utils import assert_parity

    src = "/root/testdata/sf0.001"
    root = tmp_path / "sf_onedoc"
    root.mkdir()
    for t in TABLES:
        p = os.path.join(src, f"{t}.parquet")
        if t == "documents":
            docs = pq.read_table(p)
            one = docs.filter(pc.is_valid(docs.column("text"))).slice(0, 1)
            assert one.num_rows == 1 and one.column("text")[0].as_py()
            pq.write_table(one, str(root / f"{t}.parquet"))
        else:
            shutil.copy(p, str(root / f"{t}.parquet"))
    assert_parity(spark, str(root), load_all()["l5b_ml_tfidf"])
