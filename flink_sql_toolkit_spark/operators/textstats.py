"""Text analysis operators for training-data pipelines.

Language-ID (n-gram/stopword heuristic), quality scoring, token
counting, and document fingerprinting over the ``documents`` fixture
— all pure ``pyspark.sql.functions`` expressions (JVM-side,
whole-stage-codegen'd; no Python in the hot path), each with an exact
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_sql_toolkit_spark.operators.registry import register
from flink_sql_toolkit_spark.operators.dedup import NORMALIZED_SQL, normalized_text
from flink_sql_toolkit_spark.tables import load_fanout_table, load_table

# tiny built-in stopword sets for the language-ID heuristic
STOP_EN = ("the", "a", "of", "and", "to")
STOP_ES = ("el", "la", "de", "y", "que")
STOP_FR = ("le", "la", "de", "et", "que")


def _hits_sql(words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(words, w -> w IN ({inlist})))"


def _hits(words_col, words: tuple[str, ...]):
    return F.size(F.filter(words_col, lambda w: w.isin(*words)))


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features + token counting in one projection: whitespace
    token counts (BPE-ish regex split on normalized text), length /
    punctuation / stopword ratios, and a pass/fail gate — the standard
    pre-training corpus filter shape. Pure projection — no shuffle,
    trivially 100 TB-safe."""
    docs = load_fanout_table(spark, sf_dir, "documents")
    words = F.split(normalized_text(), " ")
    n_chars = F.length("text")
    n_words = F.size(words)
    n_punct = n_chars - F.length(F.regexp_replace(F.col("text"), r"\p{Punct}", ""))
    n_stop = _hits(words, STOP_EN)
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct_tokens"),
        (n_chars.cast("double") / n_words).alias("avg_word_len"),
        (n_punct.cast("double") / n_chars).alias("punct_ratio"),
        (n_stop.cast("double") / n_words).alias("stopword_ratio"),
        F.when((n_words >= 10) & (n_punct.cast("double") / n_chars < 0.2), 1)
        .otherwise(0)
        .alias("passes_quality"),
    ).orderBy("doc_id")


def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID heuristic (argmax over per-language
    stopword hit counts, deterministic tie-break en>es>fr), plus the
    order-insensitive document fingerprint: md5 over the sorted
    distinct word set (the classic "fingerprint" key for clustering
    reorder-edits together). Both pure projections over one pass."""
    docs = load_fanout_table(spark, sf_dir, "documents")
    words = F.split(normalized_text(), " ")
    hits_en, hits_es, hits_fr = (
        _hits(words, STOP_EN),
        _hits(words, STOP_ES),
        _hits(words, STOP_FR),
    )
    return docs.select(
        "doc_id",
        "lang",
        F.when((hits_en >= hits_es) & (hits_en >= hits_fr) & (hits_en > 0), "en")
        .when((hits_es >= hits_fr) & (hits_es > 0), "es")
        .when(hits_fr > 0, "fr")
        .otherwise("und")
        .alias("predicted_lang"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(words)))).alias("fingerprint"),
    ).orderBy("doc_id")


# fixture-sized vocabulary (production: ~50k; the boundary is
# deterministic either way — count DESC, word ASC)
UNIGRAM_VOCAB = 500


def unigram_logfreq_scores(docs: DataFrame, vocab_size: int = UNIGRAM_VOCAB) -> DataFrame:
    """CCNet-style unigram log-frequency quality scoring: documents
    made of frequent words score high, gibberish scores low. Builds
    the corpus unigram table (one word shuffle with map-side partial
    counts), keeps the top ``vocab_size`` words (count DESC, word ASC
    — a deterministic boundary), broadcasts it back, and aggregates
    per doc: token count, OOV count, and the summed per-word
    ``round(log10(count) * 1e6)`` as an exact BIGINT (integer
    micro-log units — float summation order can never perturb the
    oracle comparison; consumers derive the familiar NLL as
    ``log10(N) - sum/1e6/n_tokens``).

    Scale shape: ONE exploded-word shuffle (associative count, AQE
    coalesced), vocab is a bounded broadcast (50k words ≈ 1 MB), the
    per-doc aggregate re-uses the explode without a second shuffle of
    document content. Fixture vocab is parameterized small; production
    sizing is the constant below."""
    words = F.split(normalized_text(), " ")
    toks = docs.select("doc_id", F.explode(words).alias("word"))
    freq = toks.groupBy("word").agg(F.count("*").alias("cnt"))
    vocab = freq.orderBy(F.desc("cnt"), F.asc("word")).limit(vocab_size)
    lp = F.round(F.log10("cnt") * 1e6).cast("bigint")
    return (
        toks.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.sum(F.when(F.col("cnt").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
            F.sum(F.coalesce(lp, F.lit(0))).cast("bigint").alias("logfreq_micro"),
        )
    )


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Gopher-style per-document repetition counts (Rae et al. 2021,
    "Scaling Language Models: … Gopher", §A1.1 repetition filters —
    public): the occurrence count of the most frequent word 2-gram
    and 3-gram per document. `text_metrics` turns these into token
    fractions (overlap-unaware, like the paper's character fractions:
    a degenerate ``a a a …`` doc can exceed 1.0; the filters
    threshold low, so the tail shape is irrelevant).

    Scale shape: bigrams and trigrams share ONE tagged explode
    (``"2 "`` / ``"3 "`` prefixes — words cannot contain spaces after
    normalization, so the tag is unambiguous) and ONE (doc_id, gram)
    shuffle with map-side partial counts, then a doc_id
    re-aggregation. No per-doc O(n²) mode scan, no Python. Reuses a
    caller-materialized ``__w`` words column when present so the
    normalization cascade runs once per document, not twice
    (review r7)."""
    words_col = (
        F.col("__w") if "__w" in docs.columns
        else F.split(normalized_text(), " ")
    )
    w = docs.select("doc_id", words_col.alias("w"))
    grams = w.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("w") >= 2,
                F.expr(
                    "concat("
                    "transform(sequence(1, size(w)-1), i -> "
                    "concat('2 ', element_at(w, i), ' ', element_at(w, i+1))), "
                    "CASE WHEN size(w) >= 3 THEN "
                    "transform(sequence(1, size(w)-2), i -> "
                    "concat('3 ', element_at(w, i), ' ', element_at(w, i+1), "
                    "' ', element_at(w, i+2))) "
                    "ELSE array() END)"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("g"),
    )
    return (
        grams.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max(F.when(F.col("g").startswith("2 "), F.col("c"))).alias("top_bg_cnt"),
            F.max(F.when(F.col("g").startswith("3 "), F.col("c"))).alias("top_tg_cnt"),
        )
    )


# adjacent-duplicate-token ratio over the materialized `__w` words
# column: pure JVM array expression, no shuffle; 0.0 for 1-word docs
# (sequence(2, 1) would count DOWN in Spark — the guard is load-bearing)
_ADJ_REP_SQL_SPARK = (
    "CASE WHEN size(__w) >= 2 THEN "
    "CAST(size(filter(transform(sequence(2, size(__w)), "
    "i -> element_at(__w, i) = element_at(__w, i-1)), b -> b)) AS DOUBLE)"
    " / (size(__w) - 1) ELSE 0.0 END"
)


@register(
    "text_metrics",
    # quality scoring + token counting + language-ID + fingerprinting
    # in ONE single-pass projection — one driver entry proves the full
    # text-analysis battery; still no shuffle, no Python
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, lang, words,
             length(text) AS n_chars,
             len(words) AS n_words,
             len(list_distinct(words)) AS n_distinct_tokens,
             length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS n_punct,
             {_hits_sql(STOP_EN)} AS hits_en,
             {_hits_sql(STOP_ES)} AS hits_es,
             {_hits_sql(STOP_FR)} AS hits_fr
      FROM (SELECT doc_id, lang, text, string_split({NORMALIZED_SQL}, ' ') AS words FROM documents)
    ),
    toks AS (
      SELECT doc_id, unnest(string_split({NORMALIZED_SQL}, ' ')) AS word
      FROM documents
    ),
    vocab AS (
      SELECT word, count(*) AS cnt FROM toks GROUP BY word
      ORDER BY cnt DESC, word ASC LIMIT {UNIGRAM_VOCAB}
    ),
    scores AS (
      SELECT t.doc_id,
             count(*) AS n_tok,
             CAST(sum(CASE WHEN v.cnt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
             CAST(sum(coalesce(CAST(round(log10(v.cnt) * 1e6) AS BIGINT), 0)) AS BIGINT)
               AS logfreq_micro
      FROM toks t LEFT JOIN vocab v USING (word)
      GROUP BY t.doc_id
    ),
    grams AS (
      SELECT doc_id, unnest(
        CASE WHEN len(words) >= 2 THEN
          list_concat(
            list_transform(generate_series(1, len(words)-1),
                           i -> '2 ' || words[i] || ' ' || words[i+1]),
            CASE WHEN len(words) >= 3 THEN
              list_transform(generate_series(1, len(words)-2),
                             i -> '3 ' || words[i] || ' ' || words[i+1]
                                  || ' ' || words[i+2])
            ELSE [] END)
        ELSE [] END) AS g
      FROM (SELECT doc_id, string_split({NORMALIZED_SQL}, ' ') AS words
            FROM documents)
    ),
    rep AS (
      SELECT doc_id,
             max(CASE WHEN g LIKE '2 %' THEN c END) AS top_bg_cnt,
             max(CASE WHEN g LIKE '3 %' THEN c END) AS top_tg_cnt
      FROM (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g)
      GROUP BY doc_id
    )
    SELECT doc_id, lang, n_chars, n_words, n_distinct_tokens,
           CAST(n_chars AS DOUBLE) / n_words AS avg_word_len,
           CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
           CAST(hits_en AS DOUBLE) / n_words AS stopword_ratio,
           CASE WHEN n_words >= 10 AND CAST(n_punct AS DOUBLE) / n_chars < 0.2
                THEN 1 ELSE 0 END AS passes_quality,
           CASE WHEN hits_en >= hits_es AND hits_en >= hits_fr AND hits_en > 0 THEN 'en'
                WHEN hits_es >= hits_fr AND hits_es > 0 THEN 'es'
                WHEN hits_fr > 0 THEN 'fr'
                ELSE 'und' END AS predicted_lang,
           md5(array_to_string(list_sort(list_distinct(words)), ' ')) AS fingerprint,
           CASE WHEN len(words) >= 2 THEN
             CAST(len(list_filter(list_transform(generate_series(2, len(words)),
                    i -> words[i] = words[i-1]), b -> b)) AS DOUBLE)
               / (len(words) - 1)
           ELSE 0.0 END AS adj_rep_ratio,
           s.n_tok, s.n_oov, s.logfreq_micro,
           CAST(2 * coalesce(r.top_bg_cnt, 0) AS DOUBLE) / n_words AS top_bigram_frac,
           CAST(3 * coalesce(r.top_tg_cnt, 0) AS DOUBLE) / n_words AS top_trigram_frac
    FROM feats LEFT JOIN scores s USING (doc_id) LEFT JOIN rep r USING (doc_id)
    ORDER BY doc_id
    """,
)
def text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full text-analysis battery (`text_quality_score` +
    `text_language_id` + `unigram_logfreq_scores` +
    `repetition_signals`) over documents: length/punct/stopword
    quality features + pass gate, stopword-vote language ID, the
    sorted-distinct-words fingerprint, the adjacent-duplicate-token
    ratio (all pure JVM-side single-pass expressions), the
    corpus-level unigram log-frequency score (one word shuffle +
    bounded vocab broadcast — see `unigram_logfreq_scores` for the
    100 TB shape), and the Gopher-style top-2/3-gram token fractions
    (one tagged-gram shuffle — see `repetition_signals`, r7)."""
    docs = load_fanout_table(spark, sf_dir, "documents").withColumn(
        "__w", F.split(normalized_text(), " ")
    )
    words = F.col("__w")
    n_chars = F.length("text")
    n_words = F.size(words)
    n_punct = n_chars - F.length(F.regexp_replace(F.col("text"), r"\p{Punct}", ""))
    hits_en, hits_es, hits_fr = (
        _hits(words, STOP_EN),
        _hits(words, STOP_ES),
        _hits(words, STOP_FR),
    )
    scores = unigram_logfreq_scores(docs)
    return docs.select(
        "doc_id",
        "lang",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct_tokens"),
        (n_chars.cast("double") / n_words).alias("avg_word_len"),
        (n_punct.cast("double") / n_chars).alias("punct_ratio"),
        (hits_en.cast("double") / n_words).alias("stopword_ratio"),
        F.when((n_words >= 10) & (n_punct.cast("double") / n_chars < 0.2), 1)
        .otherwise(0)
        .alias("passes_quality"),
        F.when((hits_en >= hits_es) & (hits_en >= hits_fr) & (hits_en > 0), "en")
        .when((hits_es >= hits_fr) & (hits_es > 0), "es")
        .when(hits_fr > 0, "fr")
        .otherwise("und")
        .alias("predicted_lang"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(words)))).alias("fingerprint"),
        F.expr(_ADJ_REP_SQL_SPARK).alias("adj_rep_ratio"),
    ).join(scores, "doc_id", "left").join(
        repetition_signals(docs), "doc_id", "left"
    ).withColumn(
        # overlap-unaware Gopher token fractions: an int numerator and
        # ONE double division keep Spark and DuckDB bit-identical
        "top_bigram_frac",
        F.expr("CAST(2 * coalesce(top_bg_cnt, 0) AS DOUBLE) / n_words"),
    ).withColumn(
        "top_trigram_frac",
        F.expr("CAST(3 * coalesce(top_tg_cnt, 0) AS DOUBLE) / n_words"),
    ).drop("top_bg_cnt", "top_tg_cnt").orderBy("doc_id")


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing for training pipelines: bin documents into
    packs whose summed token counts stay under ``max_tokens`` (the
    context-length budget), first-fit-decreasing WITHIN each
    partition.

    Scale shape: packing is embarrassingly partition-local — each
    partition packs its own docs over one Arrow batch stream
    (``applyInPandas`` per partition id), no shuffle of document
    content, no global coordination. Per-partition FFD is the
    standard approximation (global optimal packing is NP-hard and
    irrelevant at 10^9 docs); fill ratio only improves as partitions
    get bigger. Docs longer than the budget become single-doc
    overflow packs, flagged ``truncate_needed`` rather than silently
    dropped.

    Output: one row per pack — (pack_id, doc_ids, n_docs,
    total_tokens, truncate_needed).
    """
    import pandas as pd  # noqa: PLC0415

    out_schema = (
        "pack_id string, doc_ids array<long>, n_docs int, "
        "total_tokens long, truncate_needed boolean"
    )

    # no inline hints: partial/deferred-string annotations make
    # applyInPandas warn "Cannot infer the eval type" on every call
    def pack(key, pdf):
        pid = key[0]
        rows = sorted(
            zip(pdf[id_col], pdf[token_col]), key=lambda r: (-r[1], r[0])
        )
        bins: list[list] = []  # [remaining, [doc_ids], total]
        overflow = []
        for doc_id, n in rows:
            n = int(n)
            if n > max_tokens:
                overflow.append((doc_id, n))
                continue
            for b in bins:
                if b[0] >= n:
                    b[0] -= n
                    b[1].append(doc_id)
                    b[2] += n
                    break
            else:
                bins.append([max_tokens - n, [doc_id], n])
        out = [
            (f"{pid}-{i}", ids, len(ids), total, False)
            for i, (_rem, ids, total) in enumerate(bins)
        ] + [
            (f"{pid}-of-{i}", [doc_id], 1, n, True)
            for i, (doc_id, n) in enumerate(overflow)
        ]
        return pd.DataFrame(
            out,
            columns=["pack_id", "doc_ids", "n_docs", "total_tokens", "truncate_needed"],
        )

    work = df.select(id_col, token_col, F.spark_partition_id().alias("_pid"))
    return work.groupBy("_pid").applyInPandas(pack, out_schema)


# PII patterns kept in the Java-regex subset; applied as chained
# JVM-side regexp_replace — no Python in the path, linear scans.
PII_PATTERNS = {
    "email": (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\+?\d[\d\-\s().]{7,}\d", "<PHONE>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
}


def redact_pii(
    df: DataFrame, text_col: str = "text", kinds: tuple[str, ...] = tuple(PII_PATTERNS)
) -> DataFrame:
    """Scrub common PII shapes from a text column before training —
    chained ``regexp_replace`` (codegen'd, no shuffle), with per-kind
    hit counts so the pipeline can report/threshold redaction rates.
    IP/SSN before phone: the phone pattern would otherwise swallow
    dotted/dashed digit runs that are really IPs or SSNs."""
    order = sorted(kinds, key=lambda k: 0 if k in ("ipv4", "ssn") else 1)
    out = df
    cleaned = F.col(text_col)
    for kind in order:
        pattern, token = PII_PATTERNS[kind]
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(cleaned, F.lit(pattern), F.lit(0))),
        )
        cleaned = F.regexp_replace(cleaned, pattern, token)
    return out.withColumn(f"{text_col}_redacted", cleaned)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    max_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into max-token chunks with overlap — the
    standard pre-training / RAG chunking stage.

    Same shuffle-free lineage as ``dedup.shingles``: split to a word
    array, ``explode(sequence(...))`` over chunk starts, slice the
    parent array per chunk — one WholeStageCodegen projection, a
    doc's chunks never leave its partition, no Python anywhere.
    Output: (doc_id, chunk_id, n_chunk_tokens, chunk) with chunk_id
    dense from 0 per doc; short docs yield exactly one chunk.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap ({overlap}) < max_tokens ({max_tokens})")
    stride = max_tokens - overlap
    words = F.split(normalized_text(text_col), " ")
    n_chunks = F.greatest(
        F.ceil((F.size("words") - F.lit(overlap)) / F.lit(stride)).cast("int"),
        F.lit(1),
    )
    return (
        df.filter(F.col(text_col).isNotNull())
        .select("doc_id", words.alias("words"))
        .select(
            "doc_id",
            "words",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.slice(
                "words", F.col("chunk_id") * stride + 1, max_tokens
            ).alias("_toks"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("_toks").alias("n_chunk_tokens"),
            F.concat_ws(" ", "_toks").alias("chunk"),
        )
    )


# -- dataset assembly: deterministic splits + stratified sampling -----

SPLIT_BUCKETS = 10_000


def _hash_bucket(id_col, salt: str):
    """Deterministic per-row bucket in [0, SPLIT_BUCKETS): the first 8
    hex chars of md5(id ':' salt) as an integer. md5 (not xxhash64)
    for the same reason as dedup.py: the DuckDB oracle computes the
    identical value — swap to xxhash64 at production scale. Pure
    projection: no shuffle, no state, reproducible across runs and
    engines."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(":" + salt))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % SPLIT_BUCKETS
    )


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — the dataset-assembly
    step every training pipeline needs. Hash-bucketed on the document
    id, so the split is stable under re-runs, reshuffles, and
    incremental appends (a new document lands in a split without
    moving any existing one); proportions hold in expectation per
    bucket arithmetic. O(1) per row, no shuffle."""
    bucket = _hash_bucket(F.col(id_col), salt)
    acc = 0.0
    thresholds = []
    for name, w in weights:
        acc += w
        thresholds.append((name, int(round(acc * SPLIT_BUCKETS))))
    # ascending WHEN chain: bucket < cut_i → label_i; tail = last label
    expr = None
    for name, cut in thresholds[:-1]:
        cond = bucket < cut
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(thresholds[0][0]) if expr is None else expr.otherwise(thresholds[-1][0])
    )
    return df.withColumn("split", expr)


def stratified_keep(
    df: DataFrame,
    strata_col: str = "lang",
    rates: dict | None = None,
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum downsampling (domain/language mixing
    weights): keep a row iff its hash bucket falls under the stratum's
    rate. Unlike ``sampleBy`` this is reproducible across engines,
    runs, and partitionings — the keep decision is a pure function of
    (id, salt) — and composable with ``assign_split`` on a different
    salt. Adds ``sample_keep`` (no filter, so callers can audit the
    mass they drop)."""
    bucket = _hash_bucket(F.col(id_col), salt)
    rate_expr = F.lit(default_rate)
    for k, r in (rates or {}).items():
        rate_expr = F.when(F.col(strata_col) == k, F.lit(float(r))).otherwise(rate_expr)
    return df.withColumn(
        "sample_keep",
        bucket < F.round(rate_expr * SPLIT_BUCKETS).cast("bigint"),
    )


# -- pipeline_text_ops: driver gate for the four pipeline stages ------

# One family entry (the `asof_family` consolidation pattern) proving
# chunk_documents + redact_pii + winnow_fingerprints per-doc, plus
# pack_sequences via global conservation invariants (pack compositions
# are partition-dependent, but "every doc packed exactly once, no
# non-overflow pack exceeds the budget, token mass conserved" are
# deterministic and DuckDB-restatable).
PIPE_DOC_LIMIT = 300
PIPE_CHUNK_MAX, PIPE_CHUNK_OVERLAP = 32, 8  # stride 24
PIPE_PACK_BUDGET = 256
PIPE_WINNOW_K, PIPE_WINNOW_WINDOW = 5, 4

# deterministic synthetic PII suffix (the fixture text is digit-free,
# so without it the redaction stage would only ever see zero hits)
_PII_SUFFIX_SQL = (
    "' contact user' || CAST(doc_id AS VARCHAR) || '@example.com at 10.0.0.' "
    "|| CAST(doc_id % 200 AS VARCHAR) || ' ssn 123-45-6789 call +1 555-123-4567 end'"
)


def _pii_text_spark():
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com at 10.0.0."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(" ssn 123-45-6789 call +1 555-123-4567 end"),
    )


def _pipeline_oracle() -> str:
    from flink_sql_toolkit_spark.operators.textstats import PII_PATTERNS  # noqa: PLC0415

    ip_re, ip_tok = PII_PATTERNS["ipv4"]
    ssn_re, ssn_tok = PII_PATTERNS["ssn"]
    em_re, em_tok = PII_PATTERNS["email"]
    ph_re, ph_tok = PII_PATTERNS["phone"]
    stride = PIPE_CHUNK_MAX - PIPE_CHUNK_OVERLAP
    return f"""
    WITH base AS (
      SELECT doc_id,
             string_split({NORMALIZED_SQL}, ' ') AS words,
             text || {_PII_SUFFIX_SQL} AS pii_text
      FROM documents WHERE doc_id < {PIPE_DOC_LIMIT}
    ),
    chunk_agg AS (
      SELECT doc_id,
             CAST(greatest(ceil((len(words) - {PIPE_CHUNK_OVERLAP})
                                / CAST({stride} AS DOUBLE)), 1) AS BIGINT) AS n_chunks,
             md5(array_to_string(
               [array_to_string(words[(i-1)*{stride} + 1 : (i-1)*{stride} + {PIPE_CHUNK_MAX}], ' ')
                FOR i IN range(1, CAST(greatest(ceil((len(words) - {PIPE_CHUNK_OVERLAP})
                                / CAST({stride} AS DOUBLE)), 1) AS BIGINT) + 1)],
               '|')) AS chunks_sha
      FROM base
    ),
    red1 AS (
      SELECT doc_id,
             len(regexp_extract_all(pii_text, '{ip_re}')) AS n_ipv4,
             regexp_replace(pii_text, '{ip_re}', '{ip_tok}', 'g') AS t
      FROM base
    ),
    red2 AS (
      SELECT doc_id, n_ipv4,
             len(regexp_extract_all(t, '{ssn_re}')) AS n_ssn,
             regexp_replace(t, '{ssn_re}', '{ssn_tok}', 'g') AS t
      FROM red1
    ),
    red3 AS (
      SELECT doc_id, n_ipv4, n_ssn,
             len(regexp_extract_all(t, '{em_re}')) AS n_email,
             regexp_replace(t, '{em_re}', '{em_tok}', 'g') AS t
      FROM red2
    ),
    red4 AS (
      SELECT doc_id, n_ipv4, n_ssn, n_email,
             len(regexp_extract_all(t, '{ph_re}')) AS n_phone,
             md5(regexp_replace(t, '{ph_re}', '{ph_tok}', 'g')) AS redacted_sha
      FROM red3
    ),
    grams AS (
      SELECT doc_id,
             [md5(array_to_string(words[i : i + {PIPE_WINNOW_K - 1}], ' '))
              FOR i IN range(1, greatest(len(words) - {PIPE_WINNOW_K}, 0) + 2)] AS g
      FROM base
    ),
    winnow AS (
      SELECT doc_id,
             list_sort(list_distinct(
               [list_min(g[i : i + {PIPE_WINNOW_WINDOW - 1}])
                FOR i IN range(1, len(g) + 1)])) AS fps
      FROM grams
    ),
    packinv AS (
      SELECT TRUE AS packs_ok,
             count(*) AS n_docs_packed,
             CAST(sum(len(words)) AS BIGINT) AS tokens_packed
      FROM base
    ),
    assemble AS (
      SELECT doc_id,
             CASE
               WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8) AS BIGINT)
                    % 10000 < 9000 THEN 'train'
               WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8) AS BIGINT)
                    % 10000 < 9500 THEN 'val'
               ELSE 'test'
             END AS split,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':sample'), 1, 8) AS BIGINT)
               % 10000 < CASE WHEN lang = 'en' THEN 4000 ELSE 10000 END AS sample_keep
      FROM documents WHERE doc_id < {PIPE_DOC_LIMIT}
    )
    SELECT b.doc_id, c.n_chunks, c.chunks_sha,
           r.n_ipv4, r.n_ssn, r.n_email, r.n_phone, r.redacted_sha,
           len(w.fps) AS n_fingerprints,
           md5(array_to_string(w.fps, '|')) AS fp_sha,
           p.packs_ok, p.n_docs_packed, p.tokens_packed,
           a.split, a.sample_keep
    FROM base b
    JOIN chunk_agg c USING (doc_id)
    JOIN red4 r USING (doc_id)
    JOIN winnow w USING (doc_id)
    JOIN assemble a USING (doc_id)
    CROSS JOIN packinv p
    ORDER BY b.doc_id
    """


@register("pipeline_text_ops", oracle=_pipeline_oracle())
def pipeline_text_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Family gate for the four pipeline stages (VERDICT r4 ask #3):
    per-doc chunking (count + content hash), PII redaction (per-kind
    hit counts + redacted-text hash, IP/SSN-before-phone order),
    winnowing fingerprints (count + content hash), and FFD packing
    conservation invariants folded in as constant columns (pack
    membership is partition-dependent; doc/token conservation and the
    budget bound are not). Scale shape: every stage is shuffle-free or
    doc_id-local; the invariant agg is one 1-row broadcast."""
    from flink_sql_toolkit_spark.operators.dedup import winnow_fingerprints  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < PIPE_DOC_LIMIT
    )
    chunks = chunk_documents(
        docs, max_tokens=PIPE_CHUNK_MAX, overlap=PIPE_CHUNK_OVERLAP
    )
    chunk_agg = chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.md5(
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_id", "chunk"))),
                    lambda s: s["chunk"],
                ),
            )
        ).alias("chunks_sha"),
    )
    red = redact_pii(
        docs.select("doc_id", _pii_text_spark().alias("text"))
    ).select(
        "doc_id",
        "n_ipv4",
        "n_ssn",
        "n_email",
        "n_phone",
        F.md5("text_redacted").alias("redacted_sha"),
    )
    fp_agg = winnow_fingerprints(
        docs, k=PIPE_WINNOW_K, window=PIPE_WINNOW_WINDOW
    ).select(
        "doc_id",
        F.size("fingerprints").alias("n_fingerprints"),
        F.md5(F.concat_ws("|", "fingerprints")).alias("fp_sha"),
    )
    toks = docs.select(
        "doc_id", F.size(F.split(normalized_text(), " ")).alias("n_tokens")
    )
    packs = pack_sequences(toks, max_tokens=PIPE_PACK_BUDGET, token_col="n_tokens")
    inv = packs.agg(
        F.coalesce(
            F.bool_and(
                (F.col("total_tokens") <= PIPE_PACK_BUDGET)
                | F.col("truncate_needed")
            ),
            F.lit(True),
        ).alias("packs_ok"),
        F.sum("n_docs").cast("bigint").alias("n_docs_packed"),
        F.sum("total_tokens").cast("bigint").alias("tokens_packed"),
    )
    assemble = stratified_keep(
        assign_split(docs.select("doc_id", "lang")), rates={"en": 0.4}
    ).select("doc_id", "split", "sample_keep")
    return (
        docs.select("doc_id")
        .join(chunk_agg, "doc_id")
        .join(red, "doc_id")
        .join(fp_agg, "doc_id")
        .join(assemble, "doc_id")
        .crossJoin(F.broadcast(inv))
        .orderBy("doc_id")
    )
