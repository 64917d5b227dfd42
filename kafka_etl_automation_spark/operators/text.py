"""Text-analysis operators for training-data pipelines.

All pure Catalyst expressions (no UDFs): token counting, quality scoring,
language-ID heuristics, and content fingerprinting. Word counting filters
the token array (size(filter(tokens, ...))) so any ANSI engine reproduces
the numbers exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_etl_automation_spark.operators.dedup import (
    _fanout_rebalance,
    normalized_text,
)

# Tiny per-language function-word lists for the n-gram/stopword heuristic.
# Deliberately small: the operator demonstrates deterministic, engine-
# portable scoring; production would swap in real frequency tables.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "und", "ein"),
    "fr": ("le", "la", "et", "un"),
    "es": ("el", "los", "y", "una"),
}

STOPWORDS = ("the", "a", "of", "and", "in", "to")


def token_count(col: Column | str) -> Column:
    """Whitespace token count over normalized text.

    normalized_text is trimmed and single-space collapsed, so the count is
    separators + 1 by pure length arithmetic — no split array is ever
    materialized (the 30x scale-proof put ext_token_counts at the
    board's steepest ratio; counting without allocating per-token strings
    removes most of it). Equals size(split(nt, ' ')) exactly, including
    the empty-string case (0 - 0 + 1 == size(split('', ' ')) == 1)."""
    nt = normalized_text(col)
    return (
        F.length(nt) - F.length(F.replace(nt, F.lit(" "), F.lit(""))) + 1
    ).cast("int")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Rough subword-token estimate: word-piece boundaries approximated by
    transitions between letters / digits / other, the classic
    pre-tokenizer shape. Counts only; no vocabulary.

    Each emitted piece of the historical insert-spaces -> collapse ->
    split pipeline is exactly one maximal single-class run ([a-z]+,
    [0-9]+ or [^a-z0-9\\s]+ — whitespace separates, is never a token), so
    counting run MATCHES needs no intermediate strings or arrays; the
    alternation is first-match so each position is consumed by its own
    class maximally. greatest(..., 1) reproduces the split pipeline's
    empty/whitespace-only result (split('') = [''] -> 1) bit-for-bit.
    The SQL oracle keeps the literal replace/split formulation — equal by
    the run-decomposition argument above, enforced by the gate hash and
    test_token_counts_match_split_pipeline."""
    c = F.col(col) if isinstance(col, str) else col
    runs = F.regexp_count(F.lower(c), F.lit(r"[0-9]+|[^a-z0-9\s]+|[a-z]+"))
    return F.greatest(runs, F.lit(1)).cast("int")


def _word_hits(col: Column | str, words: tuple[str, ...]) -> Column:
    """Count tokens equal to any of ``words``.

    Token-exact, so adjacent repeats count fully ('the the' = 2). Two
    formulations were rejected on the way here:
    - padded-substring REPLACE undercounted adjacent repeats because a
      non-overlapping replace consumes the shared separator space
      (ADVICE r01);
    - size(filter(tokens, ...)) is correct but an array HOF — lambda
      functions are CodegenFallback, evaluated interpreted per token, and
      the round-5 stage attribution showed the text-scoring projections
      (5 such filters in the curation pipeline) at 200x the scan cost.
    This version counts matches of ``(?<= )(word1|word2|...)(?= )`` over
    the space-padded normalized text: the lookarounds anchor matches to
    whole tokens WITHOUT consuming the separators, so adjacent repeats
    each match, and prefix-shadowing ('a' before 'and') is resolved by
    regex backtracking against the lookahead. regexp_count returns the
    match count directly — the earlier size(split(...)) - 1 form walked
    the identical matches but also allocated every between-match piece as
    an array element per row (split keeps trailing empties at limit -1,
    so pieces == matches + 1 exactly; equality pinned by
    test_word_hits_count_forms_agree). Plain codegen end to end —
    curation score pass 38.5s -> ~4s at the 30x scale-proof SF. The
    DuckDB oracles keep the len(list_filter(...)) form; both count the
    same tokens.
    """
    pat = "(?<= )(?:" + "|".join(words) + ")(?= )"
    padded = F.concat(F.lit(" "), normalized_text(col), F.lit(" "))
    return F.regexp_count(padded, F.lit(pat)).cast("double")


def _marker_score(col: Column | str, words: tuple[str, ...]) -> Column:
    return _word_hits(col, words)


def lang_scores(col: Column | str) -> dict[str, Column]:
    return {lang: _marker_score(col, words) for lang, words in LANG_MARKERS.items()}


def lang_id(col: Column | str) -> Column:
    """Argmax language over marker scores, 'und' (undetermined) when all
    scores are 0. Ties break by language code order — fully deterministic:
    array_position returns the FIRST index holding the max, which equals
    the old fold's later-wins-only-on-strict-> rule.

    Shaped as array_max + array_position over one score array rather than
    a nested CASE fold: conditional branches are excluded from Spark's
    subexpression elimination, so the fold form re-evaluated each marker
    scan up to ~6x per row (round-5 plan read); here each score expression
    appears once, unconditionally — CSE collapses the repeats."""
    codes = sorted(LANG_MARKERS)
    scores = F.array(*[_marker_score(col, LANG_MARKERS[c]) for c in codes])
    mx = F.array_max(scores)
    return F.when(mx <= 0, F.lit("und")).otherwise(
        F.element_at(
            F.array(*[F.lit(c) for c in codes]),
            F.array_position(scores, mx).cast("int"),
        )
    )


def stopword_ratio(col: Column | str) -> Column:
    return _word_hits(col, STOPWORDS) / token_count(col)


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document statistics: lengths, token counts, vocabulary richness,
    stopword ratio. Single projection — one pass over the corpus.

    Fanned out to core count first: the round-5 stage attribution showed
    these CPU-bound projections running on the scan's split count (a
    small single-file corpus scans as ~4 tasks — 15x slower than the same
    expressions at 32-way); the rebalance is guarded pass-through on any
    scan that is already wide, i.e. any real-scale corpus."""
    toks = F.split(normalized_text(text_col), " ")
    return _fanout_rebalance(df).select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        token_count(text_col).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("unique_ratio"),
        (
            F.length(F.regexp_replace(normalized_text(text_col), " ", ""))
            / F.size(toks)
        ).alias("avg_token_len"),
        stopword_ratio(text_col).alias("stopword_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite quality score in [0,1]: length signal + vocabulary richness
    + stopword naturalness — the standard cheap pre-filter in front of
    model-based quality classifiers. Deterministic double arithmetic."""
    stats = text_stats(df, text_col, id_col)
    length_signal = F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
    return stats.select(
        id_col,
        "n_tokens",
        F.round(
            length_signal * 0.4
            + F.col("unique_ratio") * 0.3
            + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.3,
            6,
        ).alias("quality"),
    )


def top_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k TF-IDF terms per document — the classic keyword/topic signal
    for corpus curation.

    tf = term count in doc; idf = ln(N / docs containing term);
    score = round(tf * idf, 6) BEFORE ranking so top-k membership is
    engine-independent. Ties break by term (deterministic).

    Plan shape: one token explode -> (doc, term) counts [shuffle 1] ->
    document frequencies [shuffle 2, one row per distinct term] ->
    keyed shuffled-hash-join idf back (vocabulary-sized: never broadcast)
    -> per-doc window top-k [shuffle 3 on doc].
    All counts map-side combine; nothing driver-side except the scalar N.
    """
    from pyspark.sql import Window

    from kafka_etl_automation_spark.operators.dedup import (
        _fanout_rebalance,
        tokens,
    )

    n_docs = df.count()  # one scalar; the reference point for idf
    tf = (
        _fanout_rebalance(df)
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # dfreq is VOCABULARY-sized — Heaps' law keeps it growing with the
    # corpus (URLs, typos, numbers), so the explicit broadcast used
    # through r08 was a latent scale bug of the r09 BroadcastOverGenerate
    # class; the tf side is already exchanged on term for its own groupBy,
    # so the keyed shuffled hash join reuses that partitioning
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq.hint("shuffle_hash"), "term").withColumn(
        "tfidf",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "tfidf", "rank")
    )


def redact(col: Column | str) -> Column:
    """Training-data scrubbing: mask email addresses and long digit runs
    (the cheap regex tier in front of model-based PII detection). Pure
    regexp_replace chain — engine-portable and one projection pass."""
    c = F.col(col) if isinstance(col, str) else col
    no_email = F.regexp_replace(
        c, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
    )
    return F.regexp_replace(no_email, r"\d{6,}", "<NUM>")


def hash_split(col: Column | str, train_pct: int = 90) -> Column:
    """Deterministic train/eval split assignment: md5 of the content's
    first 8 hex chars mod 100. Content-keyed (not row-position-keyed), so
    the split survives repartitioning, dedup reordering, and re-crawls —
    and any engine can reproduce it (md5 is portable; xxhash is not)."""
    c = F.col(col) if isinstance(col, str) else col
    bucket = F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % 100
    return F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("eval"))


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Rolling-hash document fingerprints by winnowing (the MOSS scheme):
    hash every k-token gram, slide a window of ``window`` hashes, keep each
    window's minimum, return the distinct minima per document.

    Winnowing guarantees any shared run of >= k+window-1 tokens between
    two documents produces at least one common fingerprint — the local
    plagiarism/near-copy detector that whole-document hashes can't give.

    Hashes are md5-derived 60-bit ints (first 15 hex chars), portable to
    any SQL engine for differential testing.

    Built from posexplode + window leads/mins, NOT array higher-order
    functions: HOF lambdas evaluate interpreted (no whole-stage codegen)
    and profiled at ~25µs per gram — this formulation keeps md5/conv/min
    in codegen and sorts once per document (both windows share the (id,
    pos) sort order). Values are identical: the k-gram string, its hash,
    and each window's minimum are the same arithmetic, row-wise.
    """
    from pyspark.sql import Window

    from kafka_etl_automation_spark.operators.dedup import (
        _fanout_rebalance,
        tokens,
    )

    ex = _fanout_rebalance(df).select(
        F.col(id_col).alias("id"), F.posexplode(tokens(text_col)).alias("pos", "t0")
    )
    w = Window.partitionBy("id").orderBy("pos")
    lead_toks = [F.lead("t0", j).over(w).alias(f"t{j}") for j in range(1, k)]
    grams = (
        ex.select("id", "pos", "t0", *lead_toks)
        .filter(F.col(f"t{k - 1}").isNotNull())
        .select(
            "id",
            "pos",
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(" ", *[F.col(f"t{j}") for j in range(k)])),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("gh"),
        )
    )
    wg = Window.partitionBy("id").orderBy("pos")
    complete = F.lead("gh", window - 1).over(wg).isNotNull()
    fp = F.min("gh").over(wg.rowsBetween(Window.currentRow, window - 1))
    return (
        grams.select("id", fp.alias("fp"), complete.alias("ok"))
        .filter("ok")
        .select(F.col("id").alias(id_col), "fp")
        .distinct()
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprint: md5 over normalized text plus a 64-bit rolling
    xxhash — the join key for exact dedup and incremental re-crawl diffing."""
    return _fanout_rebalance(df).select(
        F.col(id_col),
        F.md5(normalized_text(text_col)).alias("fp_md5"),
        F.xxhash64(normalized_text(text_col)).alias("fp_xx64"),
    )


def bigram_coherence(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-relative fluency score — the deterministic analog of
    LM-perplexity quality filtering: per document, the average conditional
    bigram probability P(w2|w1) = C(w1 w2)/C(w1 ·) estimated from the
    corpus itself. Repetitive/templated text scores high, token-salad
    scores low; the standard cheap filter between heuristics and a real
    LM.

    Determinism: each ratio is an IEEE-exact int/int division (identical
    in any engine); the per-document mean goes through DECIMAL sums
    (order-independent) and rounds to 6 dp — hash-stable under any
    partitioning, like every aggregate in this repo. The exact scale-18
    sum is rounded to scale 10 BEFORE the double cast (same a3 rule,
    plans/relational.py): a per-doc sum is bounded by n_bigrams <= ~1e4,
    so the scale-10 scaled integer stays under 2^53 and both engines'
    decimal->double conversions are exact — at scale 18 the scaled
    integer is ~1e21 and DuckDB's int128->double->1e-18 path
    double-rounds while Java single-rounds, a latent boundary-case flake
    the final 6 dp round can't fully mask.

    Plan shape: one bigram explode -> corpus counts (two keyed,
    map-side-combinable aggregations) -> ratio table joined back on
    (w1, w2) -> per-doc decimal mean. At 100 TB the bigram count table is
    itself large, so the join stays KEYED (no broadcast assumption);
    every shuffle key is a bigram or a doc id — never skew-prone beyond
    natural token skew, which the salted-agg operator handles if needed.

    Returns (id_col, n_bigrams, coherence); docs with fewer than two tokens
    yield no bigrams and therefore no output row.
    """
    toks = F.split(normalized_text(text_col), " ")
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.arrays_zip(
            F.slice(toks, 1, n - 1).alias("w1"),
            F.slice(toks, 2, n - 1).alias("w2"),
        ),
    ).otherwise(F.array())
    bg = _fanout_rebalance(df).select(
        F.col(id_col), F.explode(pairs).alias("p")
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))

    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    ratio = c2.join(c1.hint("shuffle_hash"), "w1").select(
        "w1", "w2", (F.col("c2") / F.col("c1")).alias("r")
    )
    return (
        # ratio is bigram-vocabulary-sized (grows with the corpus); its
        # Generate-derived estimate collapses, so pin the join strategy
        bg.join(ratio.hint("shuffle_hash"), ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.sum(F.col("r").cast("decimal(38,18)"))
                .cast("decimal(38,10)")
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("coherence"),
        )
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Intra-document repetition signals (the Gopher-rule family):
    duplicate-bigram fraction (1 - distinct/total) and the mode bigram's
    share of the document — templated/spammy text lights up both.

    dup fraction is a pure array projection (no shuffle); the mode share
    needs per-(doc, bigram) counts -> two keyed, map-side-combinable
    aggregations on (id, bigram) then (id). Docs with < 2 tokens yield no
    row (no bigrams to judge).
    """
    toks = F.split(normalized_text(text_col), " ")
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("w1"), F.slice(toks, 2, n - 1).alias("w2")
    )
    base = _fanout_rebalance(df).filter(n >= 2).select(
        F.col(id_col),
        pairs.alias("bgs"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(pairs)) / F.size(pairs), 6
        ).alias("dup_bigram_frac"),
    )
    counts = (
        base.select(id_col, "dup_bigram_frac", F.explode("bgs").alias("bg"))
        .groupBy(id_col, "dup_bigram_frac", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.groupBy(id_col, "dup_bigram_frac").agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        F.round(F.max("c") / F.sum("c"), 6).alias("mode_bigram_share"),
    ).select(id_col, "n_bigrams", "dup_bigram_frac", "mode_bigram_share")
