"""Text analysis primitives — SURVEY §2.12 L4/L5 and the shingle /
fingerprint machinery behind the dedup family (L1/L2).

Everything here is built from JVM-side `pyspark.sql.functions`
(split / transform / aggregate / md5) — no Python UDFs — so the text
pipeline stays inside whole-stage codegen at 100 TB. The hash basis
is md5-prefix (16 hex chars = 64 bits) rather than xxhash64 so the
DuckDB oracle can recompute identical values (both engines ship
md5; neither shares an xxhash seed).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny deterministic stopword list used by lang-id and quality ops.
#: Must stay plain-alpha: quality_score interpolates these into a
#: regex alternation, and a metacharacter or whitespace entry would
#: silently change its semantics — the assert makes that fail loudly
#: at import time instead.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in")
# Explicit raise, not `assert`: python -O strips asserts, and this is
# a regex-injection guard, not a debugging aid (ADVICE r8).
if not all(s.isalpha() and s.isascii() for s in EN_STOPWORDS):
    raise ValueError(
        "EN_STOPWORDS entries must be plain ASCII letters: they are "
        "embedded unescaped in quality_score's regex alternation"
    )

#: BPE-ish token pattern: letter runs, digit runs, or single symbols
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def canon_lower(col: str | Column) -> Column:
    """Engine-portable lowercasing: Unicode simple lowercase plus an
    explicit pin of the two mappings where Java (Spark's UTF8String)
    and utf8proc (DuckDB) legitimately disagree:

    - U+0130 İ — Java's special casing emits 'i' + combining dot
      (U+0307, two codepoints), utf8proc a plain 'i'; pinned by
      pre-mapping İ→I so neither engine takes its special path.
    - Greek capital sigma — Java applies the CONTEXT-SENSITIVE final
      form (ς at word end, 'ΑΣ'→'ας'), utf8proc the context-free σ;
      pinned by post-mapping ς→σ (which also canonicalizes literal
      final sigmas in the input, on both sides).

    Every oracle-gated text canonicalization must pair this with the
    identical SQL twin (queries/llm.py `_canon_lower_sql`) — a bare
    lower()/lower() pair silently diverges on Turkish/Greek text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(F.lower(F.translate(c, "İ", "I")), "ς", "σ")


def canon_lower_py(s: str) -> str:
    """Python twin of :func:`canon_lower` for driver/UDF-side code
    (the BPE encoder, UDTF eval bodies): str.lower() carries the same
    Java-style İ and final-sigma special casings, so the identical
    pre/post maps apply. Keep the THREE canon twins (Column, SQL,
    Python) in lockstep — a new pin edits all three or silently
    desynchronizes the trainer from the encoder."""
    return s.replace("İ", "I").lower().replace("ς", "σ")


def words(col: str | Column) -> Column:
    """Whitespace tokens of the canonically-lowercased text (empty
    strings filtered — Spark's split keeps a trailing empty token)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(canon_lower(c), "\\s+"), lambda w: w != "")


def token_count(col: str | Column) -> Column:
    """L4: whitespace token count (NULL text → NULL, never -1 — the
    catalog session runs non-ANSI, where Spark's legacy
    ``size(NULL)`` is -1, a sentinel that silently DECREMENTS any
    SUM it reaches, while every DuckDB oracle twin's ``len(NULL)``
    is NULL and skipped by aggregates).

    Counted as ``regexp_count(\\S+)`` over the canon text, NOT
    ``size(words(...))``: a token is a maximal non-whitespace run,
    which is exactly what split('\\s+') + drop-empties yields — but
    the size form needed a _null_safe_size CaseWhen whose branch
    re-evaluated the split per row (conditional branches are
    excluded from codegen subexpression elimination — the
    quality_score lesson), and regexp_count NULL-propagates for
    free. Measured 2.7 → 1.35 s over 4M docs."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(canon_lower(c), F.lit(r"\S+"))


def bpe_ish_token_count(col: str | Column) -> Column:
    """L4: sub-word-ish token count via the BPE-flavored regex
    (NULL text → NULL, never -1 — regexp_count NULL-propagates,
    and counting needs no materialized match array)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(TOKEN_REGEX))


def word_shingles(col: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles (the MinHash basis). Sequence indices are
    0-based inside expr-land; documents shorter than n words yield an
    empty array.

    Catalyst does not CSE the regex word-split across lambda bodies —
    higher-order functions re-evaluate an embedded subtree once per
    ELEMENT ACCESS, so an inlined ``words(col)`` would re-tokenize
    the document for every element_at — so the word array is
    LET-BOUND via a one-element transform (the doc_fingerprint
    pattern): tokenize once per row, every inner reference a variable
    read. The outer lambda calls the unwrapped guarded body directly
    rather than :func:`shingles_from_words` — the lambda variable is
    already a variable read, so the twin's defensive re-binding would
    only add a second nested one-element wrapper per row (ADVICE r8).
    In hot paths still prefer materializing the array as a real
    column and calling the twin (CollapseProject keeps a non-cheap
    multi-referenced alias as a real projection), which also lets
    OTHER expressions share it."""
    return F.transform(
        F.array(words(col)),
        lambda w: F.when(F.size(w) >= n, _shingles_of(w, n)).otherwise(
            F.array().cast("array<string>")
        ),
    )[0]


def shingles_from_words(w: Column, n: int = 3) -> Column:
    """Shingles over an already-materialized word-array column —
    the hot-path twin of :func:`word_shingles`.

    The input is let-bound here DEFENSIVELY even though callers pass
    a materialized ``__w`` column: a filter pushdown can strip the
    alias down to a single reference, at which point CollapseProject
    merges the projection and inlines the tokenizer expression into
    the per-shingle lambda — re-tokenizing the document once per
    element access (found in l12's plan despite its materialized
    ``__w``). Binding costs a one-element array wrap when ``w`` is
    already an attribute; it makes the per-element references
    variable reads no matter what the optimizer inlines."""
    return F.transform(
        F.array(w),
        lambda W: F.when(F.size(W) >= n, _shingles_of(W, n)).otherwise(
            F.array().cast("array<string>")
        ),
    )[0]


def _shingles_of(w: Column, n: int) -> Column:
    idx = F.sequence(F.lit(0), F.size(w) - n)
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, (i + k + 1).cast("int")) for k in range(n)]
        ),
    )


def hash64(col: Column, seed: int) -> Column:
    """Seeded 64-bit-ish hash as a 16-hex-char string: md5 prefix of
    ``seed|value``. Oracle-reproducible (DuckDB md5) and uniform
    enough for fingerprinting. NULL propagates: concat_ws silently
    SKIPS null inputs, which would otherwise give every NULL value
    the same constant hash md5(seed) — clustering all NULL docs as
    'identical content' in any dedup keyed on the hash."""
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.substring(F.md5(F.concat_ws("|", F.lit(str(seed)), col)), 1, 16)
    )


#: universal-hash family for MinHash: h_j(x) = (a_j*x + b_j) mod P over
#: x = md5-prefix-derived 48-bit int reduced mod P. ONE md5 per shingle
#: serves every hash function (12 md5s per shingle would cost 12x the
#: CPU on both engines); the affine-mod-P wraparound de-correlates the
#: functions (a plain multiply would preserve argmin and collapse the
#: signature to one effective hash). P = 2^31 - 1 (prime), coefficients
#: fixed so the DuckDB oracle reproduces values bit-for-bit.
MINHASH_P = 2147483647
MINHASH_COEFFS: tuple[tuple[int, int], ...] = (
    (1373158607, 239081663),
    (53710185, 1592467581),
    (590620972, 525901256),
    (479341424, 299655412),
    (1581559893, 220106707),
    (1453201079, 1590571865),
    (1915941033, 1171165722),
    (186699714, 1268073012),
    (906070221, 68252793),
    (63989048, 201209005),
    (469521478, 499635468),
    (1085242217, 1292825378),
    (56985562, 1205264595),
    (427000597, 1537640408),
    (1395616197, 1506083910),
    (1170252924, 900911954),
)


def shingle_base_hash(col: Column) -> Column:
    """x: the per-shingle base hash — 48-bit md5 prefix as int,
    reduced mod P. (48 bits so a_j * x fits signed-64 on both
    engines.)"""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint"),
        F.lit(MINHASH_P),
    )


def minhash_value(x: Column, j: int) -> Column:
    """h_j(x) = (a_j*x + b_j) mod P."""
    a, b = MINHASH_COEFFS[j]
    return F.pmod(x * F.lit(a) + F.lit(b), F.lit(MINHASH_P))


def lang_id(col: str | Column) -> Column:
    """L4: n-gram-heuristic language ID. Deterministic stopword-vote:
    classify 'en' when at least 2 distinct English stopwords occur,
    else 'und'. (The fixtures' text is synthetic English-like for all
    lang labels, so this is exercised as an operator, not an accuracy
    benchmark; a production model slots in as a pandas UDF.)"""
    w = words(col)
    hits = F.size(F.array_intersect(F.array_distinct(w), F.array(*[F.lit(s) for s in EN_STOPWORDS])))
    return F.when(hits >= 2, F.lit("en")).otherwise(F.lit("und"))


def quality_score(col: str | Column) -> Column:
    """L4: composite quality score in [0,1]: mean of
    (length in bounds, stopword ratio >= 0.05, mean word length in
    [2, 12]). All-integer/ratio arithmetic — deterministic. Zero-word
    text scores 0.0 BY DEFINITION (pinned explicitly on both engines:
    the ratio terms are 0/0, which Spark's non-ANSI division makes
    NULL but DuckDB's IEEE division makes NaN — and DuckDB orders NaN
    greater than everything, so an unpinned empty document would
    score 0.333 there and NULL here)."""
    c = F.col(col) if isinstance(col, str) else col
    # Codegen path, NOT the words() array: this score sits in the
    # per-row hot loop of l4/l14/l15/l17/l26, and the previous
    # three-higher-order-function form (filter-empties + stopword
    # filter + length fold — each an INTERPRETED per-element pass)
    # measured 9.1 s of l15's 9.7 s at the 8x probe. The regex forms
    # below are row-identical (token = maximal \S+ run, exactly what
    # split('\s+') + drop-empties yields; the oracle twin
    # _QUALITY_SQL stays list-based, so every parity suite gates the
    # equivalence) and stay inside whole-stage codegen.
    low = canon_lower(c)
    n = F.regexp_count(low, F.lit(r"\S+"))
    # a stopword hit is a WHOLE token: non-\S (or edge) on both sides
    stop_hits = F.regexp_count(
        low,
        F.lit(r"(?<!\S)(?:%s)(?!\S)" % "|".join(EN_STOPWORDS)),
    )
    len_ok = (F.length(c) >= 20) & (F.length(c) <= 100000)
    stop_ok = (stop_hits.cast("double") / n) >= 0.05
    # TRUE mean word length = non-whitespace chars / tokens (word
    # lengths sum to the \s+-stripped length by construction; the
    # earlier (length - n + 1) / n shortcut assumed exactly one
    # separator char between words, so double-spaced / columnar text
    # inflated the estimate and lost a third of its score despite
    # normal words)
    mean_wlen = (
        F.length(F.regexp_replace(low, r"\s+", "")).cast("double") / n
    )
    wlen_ok = (mean_wlen >= 2.0) & (mean_wlen <= 12.0)
    score = (
        len_ok.cast("int") + stop_ok.cast("int") + wlen_ok.cast("int")
    ).cast("double") / 3.0
    # COALESCE, not WHEN(n == 0, ...): codegen subexpression
    # elimination skips expressions under conditional branches, so a
    # CaseWhen wrapper re-evaluates canon_lower + the regexes up to
    # 6x per row (measured 9.6 s vs 2.2 s over 4M docs). Coalesce's
    # FIRST argument is unconditional — the whole score tree CSEs —
    # and the algebra pins the same two edge results: score is NULL
    # exactly when n = 0 (the 0/0 ratios) or text IS NULL, and
    # n * 0.0 is 0.0 for the former, NULL for the latter.
    return F.coalesce(score, n * F.lit(0.0))


def doc_fingerprint(col: str | Column, gram: int = 8) -> Column:
    """L4: document fingerprint — the minimum seeded hash over all
    ``gram``-char rolling character windows (winnowing-style, window
    = whole doc). Robust to small appends/prepends unlike a full-text
    hash; identical docs ⇒ identical fingerprint.

    The lowered text is LET-BOUND via a single-element transform:
    higher-order functions re-evaluate any embedded subtree once per
    ELEMENT, so referencing ``canon_lower(text)`` directly inside the
    per-gram lambda re-lowered the whole document once per character
    window — O(len²) character work per doc. Binding it as the
    lambda variable of an outer one-element ``transform`` evaluates
    it once per row and makes every inner reference a variable read
    (measured: 2.17 → 0.27 s for the fingerprint projection over
    sf0.1, identical values). NULL text flows through unchanged
    (array(NULL) → lambda(NULL) → NULL)."""
    c = F.col(col) if isinstance(col, str) else col

    def fp(low: Column) -> Column:
        idx = F.sequence(
            F.lit(1), F.greatest(F.length(low) - gram + 1, F.lit(1))
        )
        grams = F.transform(idx, lambda i: F.substr(low, i, F.lit(gram)))
        return F.array_min(F.transform(grams, lambda g: hash64(g, 0)))

    return F.transform(F.array(canon_lower(c)), fp)[0]


def md5_rank(salt: str, col: str | Column) -> Column:
    """Engine-portable deterministic pseudorandom rank: the first 8
    hex chars of md5(salt ‖ value) as a bigint (no mod). Ordering by
    it IS the reproducible shuffle primitive — change the salt,
    change the permutation — with the same SQL twin rendering as
    :func:`md5_bucket` minus the ``% mod``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")


def md5_bucket(salt: str, col: str | Column, mod: int) -> Column:
    """Engine-portable deterministic bucket draw in [0, mod):
    first 8 hex chars of md5(salt ‖ value) as a bigint, mod the
    bucket count. md5 renders identically in every engine (unlike
    xxhash64/murmur whose seeds differ), so the SQL twin
    ``('0x' || substr(md5(salt || CAST(x AS VARCHAR)), 1, 8))::BIGINT
    % mod`` reproduces the draw bit-for-bit. Shared by the split /
    packing / sampling / mixture queries (one definition, four
    oracles)."""
    return md5_rank(salt, col) % mod


def canonical_text(col: str | Column) -> Column:
    """L1b's normalization chain: lowercase, strip everything outside
    ``[a-z0-9\\s]``, collapse whitespace runs, trim — the "fuzzy
    exact" canonical form C4/Dolma-style pipelines dedup on between
    byte-exact and shingle methods. ASCII-scoped by construction
    (non-ASCII is stripped AFTER lowercasing) so Spark and DuckDB
    produce bit-identical keys; a production Unicode fold (NFKC)
    replaces this expression without touching the dedup shape.
    NULL propagates (missing text is not an empty document).

    The whitespace class is spelled out as ``[\\t\\n\\f\\r ]``, NOT
    ``\\s`` (r10): Java's ``\\s`` includes vertical tab U+000B while
    RE2's (the DuckDB oracle twin `_CANON_SQL`, and the Arrow batch
    path below) does not — a bare ``\\s`` pair silently diverged on
    VT-bearing text ('a\\x0bb' → Spark 'a b' vs oracle 'ab',
    measured r10; same class as the canon_lower İ/sigma pins)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), "[^a-z0-9\t\n\f\r ]", ""),
            "[\t\n\f\r ]+",
            " ",
        )
    )


#: below this much local input the Column-expression path wins: the
#: Python boundary costs a fixed ~0.3 s (worker round-trip + losing
#: whole-stage fusion with the downstream aggregate) while the
#: JVM-regex penalty is proportional to bytes. Measured crossover is
#: ~2 MB (sf0.1 0.6 MB: column 0.34 s vs arrow 0.69 s; 64× 38 MB:
#: column 13.4 s vs arrow 6.5 s — interpolated equal at ~1.8 MB);
#: 8 MB is conservative, and every driver fixture stays on the
#: oracle-checked Column path while probe/production corpora take
#: the Arrow path.
CANON_ARROW_MIN_BYTES = 8 << 20


def _local_scan_bytes(df) -> int | None:
    """Total bytes of the LOCAL files behind ``df``'s scan, or None
    when unknowable (remote store, in-memory source, stat failure) —
    the fan_out probe's file-walk, scoped to a yes/no size question.
    None means "assume big": a remote store is the production
    deployment, where the Arrow path is the right default."""
    import os
    from urllib.parse import unquote

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        # NOT urlparse (same reason as fan_out): '#'/'?' are legal in
        # POSIX filenames and would be truncated as fragment/query
        if f.startswith("file:"):
            path = unquote(f[5:])
            while path.startswith("//"):
                path = path[1:]
        elif "://" in f:
            return None
        else:
            path = f
        try:
            total += os.path.getsize(path)
        except OSError:
            return None
    return total


def with_canonical_text(df, text_col: str, out_col: str):
    """Append :func:`canonical_text` of ``text_col`` as ``out_col``,
    choosing the execution path by input size:

    - big (or unknown-size) input: ONE Arrow pass per batch
      (``mapInArrow`` + pyarrow.compute: utf8proc lowercase, RE2
      regex — the exact engines the DuckDB oracle runs, so the
      VT/İ/sigma corners agree by construction). Java's regex engine
      measured ~40× more core-seconds than RE2 on the strip pass
      (64× corpus: 13.7 s wall on 12 scan partitions vs 3.8 s on ONE
      arrow thread for the whole corpus, r10) — the guide-§4.2
      pattern (let Spark distribute, hand whole batches to
      vectorized native code) is the scale shape for regex-heavy
      canonicalization.
    - small local input (< :data:`CANON_ARROW_MIN_BYTES`): the
      :func:`canonical_text` Column expression — below the measured
      ~2 MB crossover the fixed Python-boundary cost exceeds the
      whole regex bill.

    The two paths are value-identical (same RE2-pinned whitespace
    class on both; tests/test_llm.py pins the corner set and runs
    the Arrow leg differentially against the Column leg). Pass only
    the columns the consumer needs before calling (mapInArrow
    defeats column pruning); NULL text propagates to NULL canon.

    Unknown size means "assume big" ONLY for sources that can BE big
    (a remote store is the production deployment; an RDD-backed
    frame can front a localCheckpoint of anything). Two unknown-size
    cases take the Column leg instead (ADVICE r10): a LITERAL
    relation (SQL VALUES / optimizer-folded rows — driver-bounded,
    where the ~0.3 s worker round-trip would dominate; PySpark
    createDataFrame frames plan as LogicalRDD and deliberately stay
    on Arrow, since a huge checkpoint prints identically), and a
    schema mapInArrow cannot convert (fails at RUNTIME where the
    Column expression works; plain UDTs convert fine on Spark 4 —
    this guard is for genuinely non-Arrow types)."""
    sz = _local_scan_bytes(df)
    if sz is not None and sz < CANON_ARROW_MIN_BYTES:
        c = F.col(text_col) if isinstance(text_col, str) else text_col
        return df.withColumn(out_col, canonical_text(c))
    if sz is None and (_is_in_memory_source(df) or not _arrow_convertible(df)):
        c = F.col(text_col) if isinstance(text_col, str) else text_col
        return df.withColumn(out_col, canonical_text(c))
    return _with_canonical_text_arrow(df, text_col, out_col)


def _is_in_memory_source(df) -> bool:
    """True when EVERY leaf of ``df``'s plan is a LITERAL relation —
    LocalRelation (SQL VALUES / optimizer-folded rows) or
    OneRowRelation. Such frames are driver-bounded (tiny), so the
    ~0.3 s Python-worker round-trip would dominate. Leaves are
    inspected individually (never a substring match over the plan
    tree): a 100 GB remote scan JOINED with a tiny VALUES lookup
    contains a LocalRelation but must keep the Arrow leg.
    Deliberately NOT matched: LogicalRDD / ExistingRDD /
    InMemoryRelation — a localCheckpoint or .cache() boundary prints
    the same way as a tiny createDataFrame and can front a 100 GB
    frame, where the Arrow leg's measured ~2x win must be kept."""
    try:
        leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        names = [leaves.apply(i).nodeName() for i in range(leaves.size())]
    except Exception:
        return False
    return bool(names) and all(
        n in ("LocalRelation", "OneRowRelation") for n in names
    )


def _arrow_convertible(df) -> bool:
    """True when every column of ``df`` converts to an Arrow field —
    the precondition mapInArrow enforces at runtime."""
    try:
        from pyspark.sql.pandas.types import to_arrow_schema

        to_arrow_schema(df.schema)
        return True
    except Exception:
        return False


def _with_canonical_text_arrow(df, text_col: str, out_col: str):
    """The mapInArrow leg of :func:`with_canonical_text` (exposed
    for the differential tests that must exercise it regardless of
    input size)."""
    import pyarrow as pa
    from pyspark.sql.types import StringType, StructField, StructType

    # copy, never df.schema.add(...): pyspark caches df.schema and
    # .add() mutates that cached object in place — the INPUT frame
    # would then claim the output column and mapInArrow's column
    # binding fails with UNRESOLVED_COLUMN
    out_schema = StructType(
        [*df.schema.fields, StructField(out_col, StringType())]
    )

    def run(batches):
        import pyarrow.compute as pc

        for b in batches:
            canon = pc.utf8_trim(
                pc.replace_substring_regex(
                    pc.replace_substring_regex(
                        pc.utf8_lower(b.column(text_col)),
                        pattern=r"[^a-z0-9\s]",
                        replacement="",
                    ),
                    pattern=r"\s+",
                    replacement=" ",
                ),
                characters=" ",
            )
            yield pa.RecordBatch.from_arrays(
                [*b.columns, canon], names=[*b.schema.names, out_col]
            )

    return df.mapInArrow(run, out_schema)
