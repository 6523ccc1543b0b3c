"""Byte-pair-encoding tokenizer — learn + apply, Spark-shaped.

The L4 token counters approximate "LLM tokens" with whitespace and a
regex; this module is the real thing: a BPE vocabulary LEARNED from
the corpus and applied per document, the way every production
tokenizer (GPT-2 BPE, SentencePiece-BPE) works.

The 100 TB shape follows how BPE training actually decomposes:

1. ``word_counts`` — the ONLY corpus-sized job: one explode +
   hash-agg to the word-TYPE table (map-side combine collapses each
   partition to its vocabulary before the shuffle — the l16/L5
   pattern). Zipf bounds the result: ~10M types for web-scale text.
2. ``learn_bpe`` — merge learning operates on the weighted type
   table, NEVER the corpus (this is the standard trainer layout, not
   a shortcut): driver-side, deterministic (max count, ties broken
   lexicographically), cost O(types × merges). For unbounded vocab
   cut to the top-K types first — the standard trainer move, and the
   frequency cut changes low-rank merges only.
3. ``bpe_token_count`` — apply is embarrassingly parallel: the merge
   ranks broadcast (a dict of ~n_merges entries), each Arrow batch
   encodes with a per-batch word cache (Zipf again: a batch re-sees
   the same types constantly), no shuffle at all.

Determinism: merge selection is (count desc, pair asc); encoding
applies merges by learned rank (lowest rank first), the exact GPT-2
``get_pairs``/min-rank loop. Same corpus → same vocab → same token
counts, on any cluster topology.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feray_spark.functions.text import canon_lower_py, words

#: marks end-of-word so merges can't cross word boundaries
EOW = "▁"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word-type table: (word, n). The one corpus-sized pass."""
    return (
        df.select(F.explode(words(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def word_types(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 1,
    max_types: int = 1_000_000,
) -> list[tuple[str, int]]:
    """Driver-side word-type list for the trainer, BOUNDED by
    construction: types below ``min_count`` are pruned in the
    aggregate, and at most ``max_types`` survive — the most frequent
    first, ties broken lexicographically so the collected list (and
    therefore the learned vocabulary) stays a pure function of the
    corpus. The Zipf argument says the tail this drops is
    hapax-legomena noise; the HARD cap is what makes the driver
    collect safe against web-garbage vocabularies at 100 TB (random
    strings, base64 blobs) where "Zipf-bounded" is an assumption,
    not a guarantee. Top-k plans as per-partition heaps + driver
    merge, never a full sort."""
    wc = word_counts(df, text_col)
    if min_count > 1:
        wc = wc.filter(F.col("n") >= min_count)
    rows = (
        wc.orderBy(F.col("n").desc(), F.col("word"))
        .limit(int(max_types))
        .collect()
    )
    return [(r["word"], r["n"]) for r in rows]


def _symbols(word: str) -> tuple[str, ...]:
    return (*word, EOW)


#: hard ceiling on the trainer's input type-table. The driver-side
#: structures are O(total symbols) ≈ O(types × avg word length):
#: measured AT this ceiling (2.0M random types, avg len 8, Zipf
#: counts, 1000 merges — the web-garbage worst case the Zipf
#: assumption doesn't cover): learn_bpe 150.5 s, driver RSS growth
#: 3.56 GB — safe under the 16 GB driver but the right order of
#: magnitude to fail LOUDLY past, instead of OOMing mid-merge
#: (scripts/bpe_trainer_probe.py + the inline ceiling measurement
#: in docs/SCALE.md's BPE row).
MAX_TRAINER_TYPES = 2_000_000


def learn_bpe(
    types: list[tuple[str, int]],
    n_merges: int,
    *,
    max_types: int = MAX_TRAINER_TYPES,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from a weighted word-type list.

    Refuses a type table past ``max_types`` (raise, not OOM): callers
    are expected to bound the collect with :func:`word_types`'
    ``max_types``/``min_count`` — this guard catches the caller that
    didn't.

    Classic Sennrich trainer over the type table, with the standard
    INCREMENTAL bookkeeping: pair counts, a pair→containing-words
    index, and a lazy-invalidation max-heap are maintained across
    merges, so each merge touches only the words that actually
    contain the merged pair — total cost O(Σ rewrite work), not
    O(types × merges). A naive recount-everything loop is days of
    driver CPU at the ``word_types`` cap (1M types × a 32k-merge
    vocabulary); this shape is minutes. Selection is deterministic:
    max count, ties → lexicographically smallest pair (the heap key
    ``(-count, pair)`` pops exactly that order), so the vocabulary is
    a pure function of the corpus. A merged pair can never re-form
    (merging only concatenates symbols), so popped winners are final.
    """
    import heapq

    if len(types) > max_types:
        raise ValueError(
            f"learn_bpe got {len(types):,} word types > max_types="
            f"{max_types:,}: bound the collect with word_types("
            "max_types=..., min_count=...) — an unbounded type table "
            "is driver-memory-unsafe (O(types x word length) state)"
        )

    # aggregate duplicate symbol sequences (distinct words can share
    # one, e.g. after case folding upstream)
    agg: dict[tuple[str, ...], int] = {}
    for w, n in types:
        if w:
            s = _symbols(w)
            agg[s] = agg.get(s, 0) + int(n)
    seqs: list[list] = [[s, n] for s, n in agg.items()]  # [symbols, weight]

    pair_counts: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = {}
    for idx, (s, n) in enumerate(seqs):
        for p in zip(s, s[1:]):
            pair_counts[p] += n
            where.setdefault(p, set()).add(idx)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        neg_c, best_pair = heapq.heappop(heap)
        c = -neg_c
        if c <= 0 or pair_counts.get(best_pair, 0) != c:
            continue  # stale entry (count changed since the push)
        merges.append(best_pair)
        merged = "".join(best_pair)
        touched: set[tuple[str, str]] = set()
        # only the words CONTAINING the pair rewrite; the where sets
        # may hold stale indices (a word rewritten past the pair) —
        # the containment check below skips those
        for idx in where.pop(best_pair, ()):
            s, n = seqs[idx]
            if best_pair not in zip(s, s[1:]):
                continue
            for q in zip(s, s[1:]):  # retract the old adjacencies
                pair_counts[q] -= n
                touched.add(q)
            out = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best_pair:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            t = tuple(out)
            seqs[idx][0] = t
            for q in zip(t, t[1:]):  # add the new adjacencies
                pair_counts[q] += n
                where.setdefault(q, set()).add(idx)
                touched.add(q)
        for q in touched:  # lazy heap: push the fresh counts
            cq = pair_counts.get(q, 0)
            if cq > 0:
                heapq.heappush(heap, (-cq, q))
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with learned merge ranks — the GPT-2 min-rank
    loop: repeatedly merge the present pair with the LOWEST learned
    rank until none apply."""
    s = list(_symbols(word))
    while len(s) > 1:
        ranked = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(s, s[1:]))
            if (a, b) in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        s[i : i + 2] = ["".join(s[i : i + 2])]
    return s


def bpe_token_count(
    text: str | Column, merges: list[tuple[str, str]]
) -> Column:
    """Per-row BPE token count under the learned merges — an Arrow-
    batched pandas UDF with a per-batch word cache (Zipf: batches
    re-see the same types), merge ranks shipped in the closure."""
    ranks = {p: i for i, p in enumerate(merges)}

    import re

    # Java \s is ASCII-only; python str.split() also breaks on Unicode
    # whitespace, which would let the encoder see word boundaries the
    # Spark-side trainer (functions.text.words, split on \s+) never
    # learned — split with the Java-equivalent class so learn and
    # apply agree on what a word is
    _ws = re.compile("[ \t\n\x0b\f\r]+")

    @F.pandas_udf("bigint")
    def _count(texts: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def count_one(t):
            # NULL text has NO token count (the module-wide counter
            # discipline: token_count/bpe_ish_token_count both
            # NULL-propagate) — 0 would skew per-source sums vs the
            # whitespace twin, whose SUM skips the NULL rows
            if t is None:
                return None
            total = 0
            # canon_lower_py: the encoder must see the SAME word
            # types the Spark-side trainer learned — bare .lower()
            # maps İ to 'i'+combining-dot where canon_lower gives 'i'
            for w in _ws.split(canon_lower_py(str(t))):
                if not w:
                    continue
                hit = cache.get(w)
                if hit is None:
                    hit = cache[w] = len(encode_word(w, ranks))
                total += hit
            return total

        return texts.map(count_one).astype("Int64")

    c = F.col(text) if isinstance(text, str) else text
    return _count(c)


def bpe_invariants(
    text: str | Column, merges: list[tuple[str, str]]
) -> Column:
    """Per-row BPE ENCODER INVARIANTS — the driver-hashable face of
    the tokenizer (the a3b/a5 promotion pattern): merge ids are
    engine-specific, but for every word ``w`` a correct encoder
    satisfies, by construction,

    - ``bounds_ok``: 1 <= len(encode(w)) <= len(w) + 1 (a word can
      merge down to one symbol at best and fall back to its chars
      plus the EOW marker at worst), and
    - ``roundtrip_ok``: concat(encode(w)) == w + EOW (merges only
      ever concatenate ADJACENT symbols, so decode is concat — the
      reconstruction property the unit tests pin on the classic
      corpus).

    Returns struct<n: bigint, bounds_ok: boolean, roundtrip_ok:
    boolean> per document (NULL text -> NULL struct fields, the
    module-wide counter discipline); zero-word docs are vacuously
    True. Same Arrow-batched shape + word cache as
    :func:`bpe_token_count`."""
    ranks = {p: i for i, p in enumerate(merges)}

    import re

    _ws = re.compile("[ \t\n\x0b\f\r]+")

    @F.pandas_udf("struct<n: bigint, bounds_ok: boolean, roundtrip_ok: boolean>")
    def _inv(texts: pd.Series) -> pd.DataFrame:
        cache: dict[str, tuple[int, bool, bool]] = {}

        def one_word(w):
            syms = encode_word(w, ranks)
            return (
                len(syms),
                1 <= len(syms) <= len(w) + 1,
                "".join(syms) == w + EOW,
            )

        def one_doc(t):
            if t is None:
                return (None, None, None)
            total, bd, rt = 0, True, True
            for w in _ws.split(canon_lower_py(str(t))):
                if not w:
                    continue
                hit = cache.get(w)
                if hit is None:
                    hit = cache[w] = one_word(w)
                total += hit[0]
                bd = bd and hit[1]
                rt = rt and hit[2]
            return (total, bd, rt)

        rows = [one_doc(t) for t in texts]
        return pd.DataFrame(
            {
                "n": pd.array([r[0] for r in rows], dtype="Int64"),
                "bounds_ok": pd.array(
                    [r[1] for r in rows], dtype="boolean"
                ),
                "roundtrip_ok": pd.array(
                    [r[2] for r in rows], dtype="boolean"
                ),
            }
        )

    c = F.col(text) if isinstance(text, str) else text
    return _inv(c)
