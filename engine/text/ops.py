"""Text analysis for training-data pipelines (task brief: language-ID,
quality scoring, token counting, document fingerprinting) over the
`documents` table.

Everything here is a NATIVE column expression (split/transform/aggregate/
regexp) — zero Python in the hot path, whole-stage codegen, and each op
has an exact DuckDB-SQL twin used by the driver oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")
FP_MOD = 2147483647  # 2^31 - 1; rolling-hash modulus


def tokens_col(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: str | Column = "text") -> Column:
    return F.size(tokens_col(text))


def stopword_frac(text: str = "text") -> Column:
    stops = ", ".join(f"'{w}'" for w in STOPWORDS)
    hits = F.size(F.expr(f"filter(split({text}, ' '), x -> x in ({stops}))"))
    return hits / F.size(tokens_col(text))


def vowel_frac(text: str | Column = "text") -> Column:
    """Fraction of non-space characters that are vowels (langid feature)."""
    c = F.col(text) if isinstance(text, str) else text
    nospace = F.regexp_replace(c, " ", "")
    vowels = F.regexp_replace(F.lower(nospace), "[^aeiou]", "")
    return F.length(vowels) / F.length(nospace)


def fingerprint_col(text: str | Column = "text") -> Column:
    """Rolling polynomial hash over characters: acc = (acc*31 + ascii) mod
    (2^31-1).  Pure integer arithmetic — bitwise identical in DuckDB
    (list_reduce twin in __spark_entry__.oracle_sql)."""
    name = text if isinstance(text, str) else None
    if name is None:
        raise NotImplementedError("fingerprint_col requires a column name")
    return F.expr(
        f"aggregate(split({name}, ''), 0L, "
        f"(acc, c) -> pmod(acc * 31 + ascii(c), {FP_MOD}L))"
    )


def with_quality(df: DataFrame, text: str = "text") -> DataFrame:
    """Quality features: lengths, token stats, stopword/vowel ratios."""
    toks = token_count(text)
    return (
        df.withColumn("n_tokens", toks)
        .withColumn("char_len", F.length(F.col(text)))
        .withColumn(
            "avg_token_len",
            F.round((F.length(F.col(text)) - toks + 1) / toks, 6),
        )
        .withColumn("stop_frac", F.round(stopword_frac(text), 6))
        .withColumn("vowel_frac", F.round(vowel_frac(text), 6))
    )


def with_langid(df: DataFrame, text: str = "text") -> DataFrame:
    """n-gram-heuristic language ID: vowel-density buckets.  Deterministic,
    SQL-expressible; a stand-in for fasttext-style LID at 100 TB scale
    (swap the expression, keep the plan shape)."""
    vf = vowel_frac(text)
    pred = (
        F.when(vf >= 0.45, F.lit("vowelic"))
        .when(vf >= 0.35, F.lit("balanced"))
        .otherwise(F.lit("consonantal"))
    )
    return df.withColumn("lang_pred", pred)


def with_fingerprint(df: DataFrame, text: str = "text") -> DataFrame:
    return df.withColumn("fingerprint", fingerprint_col(text))


# BPE-ish pre-tokenizer: letter runs / digit runs / non-alnum runs — the
# regex split GPT-style BPE applies BEFORE merges (simplified: no unicode
# category classes, so the same pattern runs identically under Java regex
# in Spark and RE2 in DuckDB).
BPE_SPLIT_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"


def with_token_counts(df: DataFrame, text: str = "text") -> DataFrame:
    """Token counting (task brief): whitespace tokens AND BPE-ish regex
    pre-tokens, plus chars-per-pretoken (a compression-ratio proxy used
    for corpus quality filtering).  Native regexp_extract_all — zero
    Python, codegen-friendly, exact DuckDB twin."""
    pre = F.expr(f"size(regexp_extract_all({text}, '{BPE_SPLIT_RE}', 0))")
    return (
        df.withColumn("n_tokens_ws", token_count(text))
        .withColumn("n_pretokens", pre)
        .withColumn(
            "chars_per_pretoken",
            # nullif guard (r2 ADVICE): an empty/all-space doc has zero
            # pretokens, where Spark's x/0 yields NULL but DuckDB's
            # ieee_floating_point_ops default yields inf/NaN — NULL on
            # both sides keeps oracle parity on degenerate docs.
            F.round(F.length(F.regexp_replace(F.col(text), " ", ""))
                    / F.nullif(F.col("n_pretokens"), F.lit(0)), 6))
    )


def top_terms(df: DataFrame, text: str = "text", k: int = 3,
              min_len: int = 3) -> DataFrame:
    """Per-doc top-k terms by frequency (ties broken lexicographically) —
    the keyword-extraction primitive of a corpus-curation pipeline
    (task brief "text analysis").  Lowercase split on non-letter runs,
    explode, two-level count, per-doc row_number window.

    Scale shape: the explode fans out to O(total tokens) rows but the
    count aggregation partial-combines per (doc_id, term) before the
    exchange, and the window partitions by doc_id — both shuffles key on
    the document, so skew is bounded by the largest single document.
    All-native; the DuckDB twin is the same split/count/row_number.
    """
    from pyspark.sql import Window

    terms = (
        df.select("doc_id",
                  F.explode(F.split(F.lower(F.col(text)), "[^a-z]+"))
                  .alias("term"))
        .filter(F.length("term") >= min_len)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("n"), F.asc("term"))
    return (terms.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def tfidf_top_terms(df: DataFrame, text: str = "text", k: int = 3,
                    min_len: int = 3, scale: int = 1_000_000,
                    broadcast_vocab: bool = True,
                    materialize_tf: bool = True) -> DataFrame:
    """Corpus-weighted top-k terms per doc — tf-idf with a RATIONAL idf:
    score_q = (tf · scale) div df, integer-exact in every engine (the
    classic log(N/df) weighting is a one-line swap but its float values
    are tie- and ULP-prone under cross-engine hashing; 1/df is the same
    "penalize corpus-common terms" signal).  Ties break lexicographic.

    Scale shape: tf = one (doc_id, term) partial-combined shuffle; the
    document-frequency table is VOCABULARY-sized (one row per distinct
    term — millions of rows at corpus scale, not corpus-sized) and is
    derived from tf with a second partial-combined shuffle, then joined
    back — broadcast by default (a 10M-term vocab is ~100 MB;
    set broadcast_vocab=False for a shuffle equi-join on term when it
    isn't).  The final per-doc window re-keys on doc_id, so skew is
    bounded by the largest single document throughout.

    `materialize_tf` (default): tf feeds BOTH the scored join and the
    vocabulary derivation, but Catalyst column-prunes the two subtrees
    differently (the vocab branch drops the count), so ReuseExchange
    does NOT fire and the corpus would be scanned + exploded TWICE
    (measured: 0 ReusedExchange, 2 scans).  One localCheckpoint of the
    already-aggregated (doc_id, term, tf) rows — far smaller than the
    token stream — makes it one pass.  Same cluster caveat as
    knn_join's per-round checkpoint: executor-local storage."""
    from pyspark.sql import Window

    tf = (
        df.select("doc_id",
                  F.explode(F.split(F.lower(F.col(text)), "[^a-z]+"))
                  .alias("term"))
        .filter(F.length("term") >= min_len)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    if materialize_tf:
        tf = tf.localCheckpoint(eager=False)
    vocab = tf.groupBy("term").agg(F.count("*").alias("df"))
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    scored = tf.join(vocab, "term").withColumn(
        "score_q", F.expr(f"(tf * {scale}) div df"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_q"), F.asc("term"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("doc_id", "term", "tf", "df", "score_q", "rnk"))


def pack_sequences(df: DataFrame, *, id_col: str = "doc_id",
                   weight_col: str = "n_chars", capacity: int = 20000,
                   group_cols: tuple[str, ...] = ("source",),
                   n_shards: int | None = None) -> DataFrame:
    """Greedy concat-then-chunk sequence packing — the step an LLM
    training pipeline runs between dedup and tokenized-shard writing:
    documents are concatenated in a deterministic order (by `id_col`
    within each group) and the resulting stream is chunked into bins of
    `capacity` weight units (chars/tokens).  A doc belongs to the bin
    where it STARTS (`bin_id` = exclusive-prefix-sum DIV capacity), so a
    doc straddling a boundary overflows its bin by at most its own
    weight — the standard concat-then-chunk approximation, deterministic
    and exactly expressible in ANSI SQL (window prefix sum + integer
    division; pure int64, no float anywhere, so the DuckDB twin is
    bit-exact).

    Scale shape: ONE window shuffle keyed by `group_cols` (plus an
    optional deterministic `pack_shard` = xxhash64(id) % n_shards when a
    single group is too large to sort in one task at 100 TB — shards
    pack independently, which only adds one partial bin per shard).
    Adds `pack_off` (exclusive prefix weight), `bin_id`, and
    `bin_offset` (start offset within the bin)."""
    from pyspark.sql import Window

    parts = [F.col(c) for c in group_cols]
    out = df
    if n_shards is not None:
        out = out.withColumn(
            "pack_shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)))
        parts.append(F.col("pack_shard"))
    w = (Window.partitionBy(*parts).orderBy(F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, -1))
    return (out
            .withColumn("pack_off",
                        F.coalesce(F.sum(F.col(weight_col).cast("long")).over(w),
                                   F.lit(0).cast("long")))
            .withColumn("bin_id", F.expr(f"pack_off DIV {capacity}"))
            .withColumn("bin_offset", F.expr(f"pack_off % {capacity}")))


def ngrams_col(text_col: str = "text", n: int = 5) -> Column:
    """Distinct word n-grams as array<string> (the exact-string form —
    no hashing, so the DuckDB twin is the same list expression).  Docs
    shorter than n words yield their whole text as the single gram
    (slice clamps identically on both engines)."""
    return F.expr(
        f"array_distinct(transform("
        f"sequence(1, greatest(size(split({text_col}, ' ')) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', slice(split({text_col}, ' '), i, {n}))))")


def decontaminate(train: DataFrame, eval_df: DataFrame, *,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 5, broadcast_eval: bool = True) -> DataFrame:
    """Eval-set decontamination — flag every training doc sharing any
    word n-gram with the eval/benchmark set, the standard guard against
    benchmark leakage into a training corpus.

    Scale shape: the eval side collapses to a DISTINCT gram set (eval
    sets are tiny next to a 100 TB corpus — broadcast by default, or a
    gram-keyed shuffle equi-join with `broadcast_eval=False` when it
    isn't); the train side streams scan → gram explode → broadcast-hash
    semi-probe → one doc_id-keyed count-distinct agg.  The corpus is
    read once and no train-side gram ever rides a shuffle except the
    hits.  Exact strings, no hashing — bit-identical in ANSI SQL."""
    grams = ngrams_col(text_col, n)
    ev = (eval_df.select(F.explode(grams).alias("gram")).distinct())
    if broadcast_eval:
        ev = F.broadcast(ev)
    hits = (train.select(F.col(id_col), F.explode(grams).alias("gram"))
            .join(ev, "gram")
            .groupBy(id_col)
            .agg(F.countDistinct("gram").alias("n_hit_grams")))
    return (train.select(id_col).join(hits, id_col, "left")
            .withColumn("n_hit_grams",
                        F.coalesce("n_hit_grams", F.lit(0).cast("long")))
            .withColumn("contaminated", F.col("n_hit_grams") > 0))


def length_buckets(df: DataFrame, n_buckets: int = 8,
                   text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Equal-depth token-length bucketing (late r4) — the batch-shaping
    step of an LLM training pipeline: group documents of similar length
    so packed batches waste minimal padding.  TIE-COHERENT: all docs of
    equal token length land in the same bucket (bucket = the length
    group's last member's equal-depth position,
    1 + ((cum - 1) * B) // total — all-integer, engine-independent),
    so the assignment is stable under repartition/resume/append-order.

    Scale shape: the corpus is scanned once into a LENGTH HISTOGRAM
    (map-side-combined groupBy; output <= max-doc-length rows).  The
    global cumulative/total windows run over that TINY histogram — not
    the corpus (the single-partition window is bounded by the length
    domain, documented here deliberately).  The per-length bucket map
    is then BROADCAST-joined back to the full table: one skinny shuffle
    + one broadcast probe at any corpus size.

    Output: (id_col, n_tokens_ws, bucket 1..n_buckets)."""
    from pyspark.sql import Window

    d = df.select(F.col(id_col),
                  token_count(text).cast("int").alias("n_tokens_ws"))
    hist = d.groupBy("n_tokens_ws").agg(F.count("*").alias("_cnt"))
    w_cum = (Window.orderBy("n_tokens_ws")
             .rowsBetween(Window.unboundedPreceding, 0))
    w_all = (Window.orderBy("n_tokens_ws")
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    bucket_map = (
        hist.withColumn("_cum", F.sum("_cnt").over(w_cum))
        .withColumn("_total", F.sum("_cnt").over(w_all))
        .select("n_tokens_ws",
                F.expr(f"CAST(1 + (_cum - 1) * {int(n_buckets)} div _total "
                       "AS INT)").alias("bucket"))
    )
    return d.join(F.broadcast(bucket_map), "n_tokens_ws") \
        .select(id_col, "n_tokens_ws", "bucket")


def chunk_docs(df: DataFrame, *, size: int = 96, overlap: int = 16,
               text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Fixed-size overlapping document chunking (late r4) — the
    RAG/context-window prep step: each document is split into character
    chunks of `size` with `overlap` chars shared between neighbours
    (stride = size - overlap).  Chunks COVER the document exactly:
    n_chunks = max(1, ceil((len - overlap) / stride)), so the last
    chunk's window always reaches the final character (asserted in
    tests/test_text_ops.py), and every doc emits >= 1 chunk (empty/short
    docs emit exactly one).

    Scale shape: one native explode over a sequence() literal — zero
    Python, zero shuffle, fan-out bounded by ceil(len/stride); chunk
    boundaries are a pure function of the row, stable under
    repartition/resume/append order.

    Output: (id_col, chunk_id, chunk_start 0-based, chunk_len,
    chunk_text) — all-integer positions, BIGINT-cast both sides of the
    oracle per the HUGEINT parity rule."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    n_chunks = F.greatest(
        F.lit(1).cast("long"),
        F.expr(f"CAST((length({text}) - {overlap} + {stride} - 1) "
               f"div {stride} AS BIGINT)"))
    d = df.select(F.col(id_col), F.col(text).alias("_t"),
                  n_chunks.alias("_nc"))
    d = d.withColumn("chunk_id",
                     F.explode(F.sequence(F.lit(0).cast("long"),
                                          F.col("_nc") - 1)))
    start = (F.col("chunk_id") * stride).cast("long")
    chunk = F.expr(f"substring(_t, CAST(chunk_id * {stride} + 1 AS INT), "
                   f"{size})")
    return d.select(
        id_col,
        F.col("chunk_id"),
        start.alias("chunk_start"),
        F.length(chunk).cast("long").alias("chunk_len"),
        chunk.alias("chunk_text"))


def repetition_stats(df: DataFrame, *, text: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition quality signals (late r4): per document,
    the duplicate-n-gram and dominant-token statistics used to filter
    degenerate (looping/boilerplate) training text.  All counts are
    exact integers — no float ratios — so the oracle comparison is
    tie-free; callers derive ratios downstream.

    Scale shape: ONE narrow projection, zero shuffle, zero Python.  The
    dominant-token count is computed per row as a max run length over
    the SORTED token array via an aggregate() HOF with a struct
    accumulator — O(n log n) per doc regardless of vocabulary, instead
    of the O(distinct x n) nested filter form (which is quadratic on
    adversarial docs).  The n-gram distinct counts use array_distinct
    on guarded sequence() windows (Spark's sequence(1,0) REVERSES —
    the IF guard is load-bearing for docs shorter than n).

    Output: (id_col, n_tokens, n_distinct_tokens, top_token_count,
    n_2grams, n_distinct_2grams, n_3grams, n_distinct_3grams), all
    BIGINT."""
    toks = f"split({text}, ' ')"
    run = ("IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, "
           "CAST(1 AS BIGINT))")
    top = (f"aggregate(array_sort({toks}), "
           "named_struct('prev', CAST(NULL AS STRING), "
           "'run', CAST(0 AS BIGINT), 'best', CAST(0 AS BIGINT)), "
           f"(acc, x) -> named_struct('prev', x, 'run', {run}, "
           f"'best', greatest(acc.best, {run})), "
           "acc -> acc.best)")

    def grams(n: int) -> str:
        return (f"IF(size({toks}) >= {n}, "
                f"transform(sequence(1, size({toks}) - {n} + 1), "
                f"i -> concat_ws(' ', slice({toks}, i, {n}))), "
                "array())")

    cols = [F.col(id_col),
            F.expr(f"CAST(size({toks}) AS BIGINT)").alias("n_tokens"),
            F.expr(f"CAST(size(array_distinct({toks})) AS BIGINT)")
            .alias("n_distinct_tokens"),
            F.expr(top).alias("top_token_count")]
    for n in (2, 3):
        g = grams(n)
        cols += [F.expr(f"CAST(size({g}) AS BIGINT)").alias(f"n_{n}grams"),
                 F.expr(f"CAST(size(array_distinct({g})) AS BIGINT)")
                 .alias(f"n_distinct_{n}grams")]
    return df.select(*cols)


def bigram_coverage(df: DataFrame, text: str = "text", k: int = 256,
                    id_col: str = "doc_id") -> DataFrame:
    """Corpus-LM coverage statistics (r4 cont.): how much of each
    document's bigram stream is covered by the corpus's top-k bigram
    vocabulary — the integer-exact surface of language-model scoring
    (n-gram hit/OOV counts; perplexity's log-space sum is the
    cross-libm float class, the hit counts are not).

    -> (doc_id, n_bigrams, n_hits, n_oov), zero rows kept for docs with
    fewer than two tokens.

    Vocabulary = top-k bigrams by (count DESC, bigram ASC) — the
    explicit total tie rule that makes the cut deterministic on any
    engine.  Scale shape: the token stream is exploded ONCE into a
    (doc, bigram) frame feeding both the corpus count (map-side
    combined, vocabulary-sized output) and the per-doc agg; the top-k
    cut is a global TakeOrdered (k rows, never a full sort) broadcast
    back as a hash join.
    """
    arr = F.filter(F.split(F.lower(F.col(text)), "[^a-z]+"),
                   lambda t: t != F.lit(""))
    # NB sequence(1, 0) is a DESCENDING [1, 0] in Spark — gate the
    # short-doc case explicitly instead of clamping the bound.
    bg = (df.withColumn("_arr", arr)
          .select(F.col(id_col), F.explode(F.expr(
              "CASE WHEN size(_arr) >= 2 THEN "
              "transform(sequence(1, size(_arr) - 1), "
              "i -> concat(element_at(_arr, i), ' ', "
              "element_at(_arr, i + 1))) "
              "ELSE array() END")).alias("bg")))
    bg = bg.localCheckpoint(eager=False)
    vocab = (bg.groupBy("bg").agg(F.count("*").alias("n"))
             .orderBy(F.desc("n"), F.asc("bg")).limit(k)
             .select("bg", F.lit(1).alias("_hit")))
    per = (bg.join(F.broadcast(vocab), "bg", "left")
           .groupBy(id_col)
           .agg(F.count("*").cast("long").alias("n_bigrams"),
                F.coalesce(F.sum("_hit"), F.lit(0)).cast("long")
                .alias("n_hits")))
    base = df.select(id_col)
    return (base.join(per, id_col, "left")
            .select(id_col,
                    F.coalesce("n_bigrams", F.lit(0)).cast("long")
                    .alias("n_bigrams"),
                    F.coalesce("n_hits", F.lit(0)).cast("long")
                    .alias("n_hits"),
                    (F.coalesce("n_bigrams", F.lit(0))
                     - F.coalesce("n_hits", F.lit(0))).cast("long")
                    .alias("n_oov")))


# committed PII patterns: simple character-class regexes chosen to
# behave identically under Java regex (Spark) and RE2 (DuckDB) — no
# backreferences, no lookaround, no alternation-order traps.  Scrub
# ORDER is part of the contract: emails first (their local parts may
# contain short digit runs), then long digit runs on the already
# email-scrubbed text, so n_number is well-defined.
PII_PATTERNS = (
    ("email", r"[a-z0-9]+@[a-z0-9]+\.[a-z]+", "<EMAIL>"),
    ("number", r"[0-9]{6,}", "<NUM>"),
)


def pii_scrub(df, id_col: str = "doc_id", text_col: str = "text"):
    """M30 — PII scrubbing (the Dolma/CCNet-style redaction pass):
    replace emails and long digit runs with typed placeholder tokens
    and count what was removed.  -> (id, scrubbed, n_email, n_number).

    All native regexp codegen — zero Python, no shuffle, rows out ==
    rows in: the 100 TB plan for redaction is `map`, nothing else."""
    from pyspark.sql import functions as F

    (em_name, em_pat, em_rep), (nu_name, nu_pat, nu_rep) = PII_PATTERNS
    s1 = F.regexp_replace(F.col(text_col), em_pat, em_rep)
    return df.select(
        F.col(id_col),
        F.regexp_replace(s1, nu_pat, nu_rep).alias("scrubbed"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(em_pat),
                                    F.lit(0)))
        .cast("long").alias("n_email"),
        F.size(F.regexp_extract_all(s1, F.lit(nu_pat), F.lit(0)))
        .cast("long").alias("n_number"))


def feature_hash(df: DataFrame, text: str = "text",
                 id_col: str = "doc_id",
                 n_buckets: int = 1024) -> DataFrame:
    """Hashing-trick sparse features (r4 cont.) -> (id, bucket, val):
    each alphanumeric token hashes to a bucket with the corpus-shared
    rolling polynomial hash (fingerprint_col's (acc*31 + ascii) mod
    2^31-1 — bit-identical in DuckDB via list_reduce), signed by an
    INDEPENDENT hash bit ((h DIV n_buckets) % 2, not h % 2, which
    would correlate sign with bucket), then summed per (doc, bucket).
    Rows whose signed sum cancels to 0 are dropped (deterministic —
    cancellation is a function of the token multiset).

    The fixed-vocabulary-free featurizer of the training-data
    pipeline: no vocab build, no broadcast, stable under corpus
    growth.  Scale shape: one native token explode + ONE
    map-side-combined (id, bucket) agg — zero Python, bounded fan-out
    per doc (its token count).
    """
    tok = df.select(
        F.col(id_col),
        F.explode(F.expr(
            f"regexp_extract_all({text}, '[A-Za-z0-9]+', 0)")).alias("tok"))
    h = F.expr(
        f"aggregate(split(tok, ''), 0L, "
        f"(acc, c) -> pmod(acc * 31 + ascii(c), {FP_MOD}L))")
    s = (tok.withColumn("h", h)
         .selectExpr(id_col,
                     f"CAST(h % {n_buckets} AS INT) AS bucket",
                     f"CASE WHEN (h DIV {n_buckets}) % 2 = 0 "
                     "THEN 1 ELSE -1 END AS sgn"))
    return (s.groupBy(id_col, "bucket")
            .agg(F.sum("sgn").cast("long").alias("val"))
            .filter(F.col("val") != 0))


def sentence_stats(df: DataFrame, *, id_col: str = "doc_id",
                   text: str = "text") -> DataFrame:
    """Sentence segmentation statistics (M40, r5 post-window) — the
    corpus-prep step between document and token granularity ->
    (doc_id, n_sentences, max_sentence_chars, sum_sentence_chars,
    first_sentence).

    The segmentation CONTRACT is the deterministic regex split on
    [.!?]+ runs followed by whitespace (abbreviation-blind by design —
    a heuristic segmenter is a documented approximation, and the
    split rule being part of the contract is what makes two engines
    agree exactly); empty fragments (leading punctuation, trailing
    terminator) are dropped; per-sentence lengths count the TRIMMED
    fragment.  All-native: one regexp split + array HOFs, zero
    shuffle, zero Python."""
    frags = (f"filter(transform(split({text}, '[.!?]+\\\\s+'), "
             "s -> trim(s)), s -> s <> '')")
    clean = (f"transform({frags}, "
             "s -> regexp_replace(s, '[.!?]+$', ''))")
    return df.select(
        F.col(id_col),
        F.expr(f"CAST(size({clean}) AS INT)").alias("n_sentences"),
        F.expr(f"CAST(coalesce(array_max(transform({clean}, "
               "s -> length(s))), 0) AS INT)")
        .alias("max_sentence_chars"),
        F.expr(f"CAST(coalesce(aggregate(transform({clean}, "
               "s -> length(s)), 0, (a, b) -> a + b), 0) AS INT)")
        .alias("sum_sentence_chars"),
        F.expr(f"coalesce(try_element_at({clean}, 1), '')")
        .alias("first_sentence"))


def stem_stats(df, text_col: str = "text", id_col: str = "doc_id"):
    """M43 (r5 cont.) — S-stemmer statistics per document under the
    PINNED Harman rule set (the rule set IS the contract — stemmers
    differ across IR stacks, so which plural forms conflate is part
    of reproducibility, exactly the text_url_canonical doctrine):

      1. suffix 'ies' (len>=4): 'aies'/'eies' unchanged, else '...y'
      2. suffix 'es'  (len>=4): 'aes'/'ees'/'oes' unchanged, else drop 's'
      3. suffix 's'   (len>=3): 'us'/'ss' unchanged, else drop 's'

    the branch is chosen by the ENDING (an exception word stays
    unchanged — it does not fall through to a later rule, per the
    published pseudo-code); tokens are the house word contract
    (lowercase split on [^a-z]+).  Emits (doc_id, n_tokens,
    n_stemmed, n_distinct_stems) — the conflation-rate profile an IR
    pipeline checks before swapping stemmers.  All-native HOFs and
    explicit substring arithmetic (no regex lookbehind — RE2-safe on
    both engines); zero shuffle beyond the base scan, zero Python."""
    from pyspark.sql import functions as F

    toks = (f"filter(split(lower({text_col}), '[^a-z]+'), "
            "x -> x != '')")
    stem = (
        "CASE "
        "WHEN length(x) >= 4 AND substring(x, length(x) - 2, 3) = 'ies' "
        "THEN (CASE WHEN substring(x, length(x) - 3, 4) "
        "IN ('aies', 'eies') THEN x "
        "ELSE concat(substring(x, 1, length(x) - 3), 'y') END) "
        "WHEN length(x) >= 4 AND substring(x, length(x) - 1, 2) = 'es' "
        "THEN (CASE WHEN substring(x, length(x) - 2, 3) "
        "IN ('aes', 'ees', 'oes') THEN x "
        "ELSE substring(x, 1, length(x) - 1) END) "
        "WHEN length(x) >= 3 AND substring(x, length(x), 1) = 's' "
        "THEN (CASE WHEN substring(x, length(x) - 1, 2) IN ('us', 'ss') "
        "THEN x ELSE substring(x, 1, length(x) - 1) END) "
        "ELSE x END")
    stems = f"transform({toks}, x -> {stem})"
    return df.select(
        F.col(id_col),
        F.expr(f"size({toks})").cast("int").alias("n_tokens"),
        F.expr(f"size(filter(zip_with({toks}, {stems}, "
               "(a, b) -> a != b), c -> c))").cast("int")
        .alias("n_stemmed"),
        F.expr(f"size(array_distinct({stems}))").cast("int")
        .alias("n_distinct_stems"))


def collocations(df, text_col: str = "text", top_k: int = 50):
    """M44 (r5 cont.) — collocation (PMI) components: the corpus's
    top_k adjacent-word bigrams by count, each with the exact integer
    sufficient statistics of pointwise mutual information —
    (w1, w2, n_pair, n_w1, n_w2, n_bigrams) — PMI = log(n_pair·N /
    (n_w1·n_w2)) is a driver epilogue; the counts never divide and
    the log never enters the plan (the agg_ols doctrine applied to
    lexical statistics).  Unigram counts use the SAME positional
    universe as the pairs (w1-position occurrences over all bigrams,
    the standard collocation contingency convention) so the four
    cells of each bigram's contingency table are recoverable.
    Deterministic top-k order: (count DESC, w1 ASC, w2 ASC).

    Scale shape: one scan -> in-plan bigram explode -> map-side-
    combined (w1, w2) count; top_k via the aggregated frame's global
    sort-limit (topk_global idiom — the frame is vocabulary², already
    collapsed); unigram join-back is TWO broadcast joins against the
    k-row winners.  Tokens are the house word contract (lowercase
    split on [^a-z]+)."""
    from pyspark.sql import functions as F

    toks = (f"filter(split(lower({text_col}), '[^a-z]+'), "
            "x -> x != '')")
    bigrams = (f"transform(sequence(1, greatest(size({toks}) - 1, 0)), "
               f"i -> struct(element_at({toks}, i) AS w1, "
               f"element_at({toks}, i + 1) AS w2))")
    pairs = (df.select(F.explode(F.expr(bigrams)).alias("b"))
             .select("b.w1", "b.w2"))
    pc = pairs.groupBy("w1", "w2").agg(F.count("*").cast("long")
                                       .alias("n_pair"))
    u1 = pairs.groupBy("w1").agg(F.count("*").cast("long").alias("n_w1"))
    u2 = pairs.groupBy("w2").agg(F.count("*").cast("long").alias("n_w2"))
    n_total = pairs.groupBy().agg(F.count("*").cast("long")
                                  .alias("n_bigrams"))
    top = (pc.orderBy(F.desc("n_pair"), F.asc("w1"), F.asc("w2"))
           .limit(top_k))
    return (top.join(F.broadcast(u1), "w1")
            .join(F.broadcast(u2), "w2")
            .crossJoin(F.broadcast(n_total))
            .select("w1", "w2", "n_pair", "n_w1", "n_w2", "n_bigrams"))


def readability_components(df, *, id_col: str = "doc_id",
                           text: str = "text"):
    """M46 (r5 cont.) — exact readability components per document:
    (n_words, n_sentences, n_syllables) — the integer sufficient
    statistics of Flesch reading ease / Flesch-Kincaid grade, whose
    float formulas (206.835 − 1.015·w/s − 84.6·syl/w, ...) stay
    driver-side epilogues.  Pinned proxies, because real syllable
    counting is dictionary-bound and real sentence splitting is
    heuristic — the RULES are the reproducibility contract:

      * words     = the house token contract (lowercase [^a-z]+ split)
      * sentences = the sentence_stats contract ([.!?]+ runs +
        whitespace, abbreviation-blind), floored at 1 for any doc
        with at least one word (Flesch divides by it)
      * syllables(word) = greatest(1, #[aeiou]+ runs) — 'y' excluded
        by contract (pinned by test: 'rhythm' counts 1 via the floor)

    All-native HOFs, zero shuffle, zero Python."""
    from pyspark.sql import functions as F

    toks = (f"filter(split(lower({text}), '[^a-z]+'), "
            "x -> x != '')")
    syl = (f"aggregate(transform({toks}, "
           "w -> greatest(1, size(regexp_extract_all(w, '[aeiou]+', 0)))), "
           "0, (a, b) -> a + b)")
    frags = (f"filter(transform(split({text}, '[.!?]+\\\\s+'), "
             "s -> trim(s)), s -> s <> '')")
    n_words = f"size({toks})"
    return df.select(
        F.col(id_col),
        F.expr(f"CAST({n_words} AS INT)").alias("n_words"),
        F.expr(f"CAST(CASE WHEN {n_words} > 0 THEN "
               f"greatest(1, size({frags})) ELSE 0 END AS INT)")
        .alias("n_sentences"),
        F.expr(f"CAST({syl} AS INT)").alias("n_syllables"))
