"""Deduplication operators for training-data pipelines (100 TB path).

Beyond the reference surface (BASELINE.json north star): exact dedup,
MinHash+LSH near-dup, SimHash signatures, n-gram Jaccard verification
over the ``documents`` fixture.

Scale design:

- Everything is shuffle-on-key DataFrame code — no driver collection,
  no pairwise O(n²): candidate pairs come only from LSH band buckets
  (or shared rare shingles), then exact Jaccard verifies candidates.
- Hashes are md5-derived so the DuckDB oracle can reproduce them
  bit-for-bit (cross-engine determinism; murmur/xxhash seeds differ
  between engines). At production scale you'd swap md5 for
  ``xxhash64`` — one line, same topology.
- MinHash is the lexicographic MIN of ``md5(seed || shingle)`` per
  seed — an order-free, associative reduction (plain min-agg →
  map-side partial aggregation works).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_sql_toolkit_spark.operators.registry import register
from flink_sql_toolkit_spark.tables import load_fanout_table, load_table

N_HASHES = 8
BAND_SIZE = 2  # 4 bands of 2 minhashes
SHINGLE_K = 5  # word 5-grams

# Degenerate-bucket cap: one boilerplate template shared by 10^6 docs
# puts them all in one LSH bucket, and in-bucket pair expansion is
# quadratic — 10^12 pairs from a single bucket. Buckets above the cap
# are excluded from pair expansion and surfaced via
# `lsh_template_clusters` instead: their members are already
# near-identical to everything in the bucket, so the cluster id IS the
# dedup verdict — emitting the pairs adds no information.
LSH_BUCKET_CAP = 10_000


def normalized_text(col: str = "text") -> Column:
    """Canonical form for exact dedup: lowercase, collapsed whitespace."""
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


NORMALIZED_SQL = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


def shingles(
    df: DataFrame, text_col: str = "text", k: int = SHINGLE_K, distinct: bool = True
) -> DataFrame:
    """Explode each doc into its word k-gram shingles.

    explode(sequence(1, n_starts)) over the split word array, then
    ``concat_ws(slice(words, i, k))`` — all non-HOF expressions, so
    the whole thing is ONE WholeStageCodegen stage with ZERO shuffle
    (the parent row's array is referenced in-stage, never copied per
    output row). Measured 3× faster at sf0.1 than the previous
    posexplode + k-1 window-leads form, whose window shuffled and
    sorted the entire token stream on doc_id; the HOF
    ``transform(sequence, ...)`` form runs interpreted (higher-order
    functions disable codegen) and measured 5× slower still. Docs
    shorter than k words yield one truncated shingle
    (``greatest(..., 1)``), matching the oracle's list slicing.
    """
    words = F.split(normalized_text(text_col), " ")
    n_starts = F.greatest(F.size("words") - (k - 1), F.lit(1))
    out = (
        # NULL text must yield no shingle rows (matching UNNEST in the
        # oracle) — without the filter, non-ANSI size(NULL) = -1 makes
        # greatest(-1-(k-1), 1) emit one empty-string shingle.
        # Callers feed a `load_fanout_table` source: the explode+md5
        # below is the heavy stage and needs the pre-spread partitions.
        df.filter(F.col(text_col).isNotNull())
        .select("doc_id", words.alias("words"))
        .select("doc_id", F.explode(F.sequence(F.lit(1), n_starts)).alias("i"), "words")
        .select(
            "doc_id",
            F.concat_ws(" ", F.slice("words", F.col("i"), k)).alias("shingle"),
        )
    )
    return out.distinct() if distinct else out


# DuckDB mirror of `shingles` (list comprehension over the word list)
SHINGLES_SQL = f"""
    SELECT doc_id, UNNEST(list_distinct([
             array_to_string(words[i : i + {SHINGLE_K} - 1], ' ')
             FOR i IN range(1, greatest(len(words) - {SHINGLE_K}, 0) + 2)
           ])) AS shingle
    FROM (SELECT doc_id, string_split({NORMALIZED_SQL}, ' ') AS words FROM documents)
"""


def _xx64_hex(col: Column, prefix: str = "") -> Column:
    """xxhash64 rendered as zero-padded fixed-width (16-char) hex so
    lexicographic MIN stays numeric MIN — the single definition of the
    rendering shared by the exact-dedup and minhash paths (review
    r11 pass 3). ``prefix`` derives an independent hash function."""
    c = F.concat(F.lit(prefix), col) if prefix else col
    return F.lpad(F.hex(F.xxhash64(c)), 16, "0")


def _content_hasher(hash_fn: str):
    """Column-expression content hash for EXACT dedup.

    ``md5`` (default) is DuckDB-reproducible, so the oracle-gated
    entries use it. ``xxhash64`` is the production choice (~5× cheaper
    per byte, JVM-intrinsic, no oracle) — but exact dedup's contract
    is collision-free-in-practice, and a single 64-bit lane reaches a
    ~50% birthday collision around 5×10⁹ docs (a colliding unique doc
    would silently be dropped as a 'duplicate'). So the xxhash64 path
    concatenates TWO independent prefixed lanes = 128 bits, matching
    md5's bound (review r11 pass 3); MinHash keeps single 64-bit
    lanes — its contract is probabilistic anyway."""
    if hash_fn == "md5":
        return F.md5
    if hash_fn == "xxhash64":
        return lambda c: F.concat(_xx64_hex(c), _xx64_hex(c, "x"))
    raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")


def dedup_exact_on(docs: DataFrame, hash_fn: str = "md5") -> DataFrame:
    """Exact-dedup core over any documents frame (doc_id, text)."""
    hasher = _content_hasher(hash_fn)
    return (
        docs.select("doc_id", hasher(normalized_text()).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("n_copies") > 1)
        .select("content_hash", "n_copies", "keeper_doc_id")
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized content.

    One shuffle on the 128-bit content hash; keeper = min doc_id.
    At 100 TB this is the canonical first pass — partial aggregation
    collapses duplicates map-side before the shuffle.
    """
    return dedup_exact_on(load_table(spark, sf_dir, "documents"))


# The fixture corpus has no exact duplicates at the driver gate's
# sf0.01, so a plain registration proves only 0 == 0 (VERDICT r6
# watch item #2). The REGISTERED entry therefore plants duplicates
# in-query — union a re-keyed copy of every 50th doc — so the gate
# exercises non-empty hash/keeper/count behavior; the pure operator
# above stays available (and is what bench.py measures against
# BASELINE continuity).
PLANT_DOC_MOD = 50
PLANT_DOC_OFFSET = 10_000_000


@register(
    "dedup_exact",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {PLANT_DOC_OFFSET} AS doc_id, text FROM documents
      WHERE doc_id % {PLANT_DOC_MOD} = 0
    )
    SELECT md5({NORMALIZED_SQL}) AS content_hash,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keeper_doc_id
    FROM planted
    GROUP BY 1
    HAVING COUNT(*) > 1
    ORDER BY content_hash
    """,
)
def dedup_exact_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dedup_exact` over the fixture plus planted duplicates: every
    doc with ``doc_id % 50 == 0`` is unioned back under a shifted id,
    so each planted group has n_copies >= 2 with the original id as
    keeper."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % PLANT_DOC_MOD == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(PLANT_DOC_OFFSET)
    )
    return dedup_exact_on(docs.unionByName(copies))


def minhash_signatures(
    spark: SparkSession, sf_dir: str, hash_fn: str = "md5"
) -> DataFrame:
    """doc_id → [minhash_0..minhash_{k-1}].

    The k hash functions are the k fixed-width hex slices of
    ``md5(shingle)`` and ``md5('x'||shingle)`` — two digests yield 8
    independent 16-hex-bit functions, so there is **no seed explode**
    (the naive seed-crossjoin costs k× rows and k× hashing; this is
    one row per shingle and 2 digests). Lexicographic min over
    fixed-width lowercase hex == numeric min, and min is associative
    → map-side partial aggregation does the heavy lifting.
    """
    sh = shingles(load_fanout_table(spark, sf_dir, "documents"), distinct=False)
    if hash_fn == "md5":
        # 2 × 128-bit digests → 8 slices of 8 hex chars
        digests = [
            F.md5(F.col("shingle")),
            F.md5(F.concat(F.lit("x"), F.col("shingle"))),
        ]
        hex_len = 32
    else:
        # production path: 4 prefixed 64-bit digests → 8 slices of
        # 8 hex chars (same function count and slice width as md5)
        _content_hasher(hash_fn)  # validates the name
        digests = [_xx64_hex(F.col("shingle"), p) for p in ("", "x", "y", "z")]
        hex_len = 16
    per = N_HASHES // len(digests)
    width = hex_len // per  # hex chars per slice
    slices = [
        F.min(F.substring(h, i * width + 1, width)).alias(f"mh{d * per + i}")
        for d, h in enumerate(digests)
        for i in range(per)
    ]
    return (
        sh.groupBy("doc_id")
        .agg(*slices)
        .select("doc_id", F.array(*[f"mh{i}" for i in range(N_HASHES)]).alias("sig"))
    )


_W = 32 // (N_HASHES // 2)
_SLICES_SQL = ", ".join(
    f"MIN(substring(md5({pre}shingle), {i * _W + 1}, {_W})) AS mh{d * (N_HASHES // 2) + i}"
    for d, pre in enumerate(("", "'x' || "))
    for i in range(N_HASHES // 2)
)
MINHASH_SQL = f"""
    WITH RECURSIVE sh AS ({SHINGLES_SQL}),
    mh AS (
      SELECT doc_id, {_SLICES_SQL}
      FROM sh GROUP BY doc_id
    ),
    sigs AS (
      SELECT doc_id, [{", ".join(f"mh{i}" for i in range(N_HASHES))}] AS sig FROM mh
    )
"""


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    {MINHASH_SQL},
    bands AS (
      SELECT doc_id, b.i AS band,
             md5(array_to_string(sig[b.i * {BAND_SIZE} + 1 : (b.i + 1) * {BAND_SIZE}], ',')) AS band_key
      FROM sigs CROSS JOIN (SELECT UNNEST(range(0, {N_HASHES // BAND_SIZE})) AS i) b
    ),
    ok AS (
      SELECT band, band_key FROM bands GROUP BY band, band_key
      HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {LSH_BUCKET_CAP}
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN ok USING (band, band_key)
      JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b
    """,
)
def dedup_minhash_lsh(
    spark: SparkSession, sf_dir: str, hash_fn: str = "md5"
) -> DataFrame:
    """MinHash + LSH banding: near-duplicate candidate pairs.

    shingle→minhash→band→bucket-group: docs are grouped by
    (band, band_key) and pairs are expanded *inside* each bucket
    (sorted collect_set → posexplode × tail-slice), so only colliding
    docs ever meet — no O(n²) — and the signature pipeline runs ONCE
    (a band self-join would recompute the whole shingle→minhash
    lineage for each side and shuffle it twice). The one shuffle
    carries (16-byte key, doc_id). Bucket skew (giant clusters of one
    template) is quadratic per bucket, so buckets larger than
    ``LSH_BUCKET_CAP`` are excluded here and surfaced as flagged
    template clusters by `lsh_template_clusters`.
    """
    ok, _flagged = _lsh_grouped_buckets(spark, sf_dir, hash_fn=hash_fn)
    return (
        ok.select(F.col("ids"), F.posexplode("ids").alias("i", "doc_a"))
        .select("doc_a", F.explode(F.expr("slice(ids, i + 2, size(ids))")).alias("doc_b"))
        .distinct()
    )


def _lsh_band_keys(
    spark: SparkSession, sf_dir: str, hash_fn: str = "md5"
) -> DataFrame:
    sigs = minhash_signatures(spark, sf_dir, hash_fn=hash_fn)
    return sigs.select(
        "doc_id",
        "sig",
        F.explode(F.sequence(F.lit(0), F.lit(N_HASHES // BAND_SIZE - 1))).alias("band"),
    ).select(
        "doc_id",
        "band",
        F.md5(
            F.concat_ws(
                ",", F.slice(F.col("sig"), F.col("band") * BAND_SIZE + 1, BAND_SIZE)
            )
        ).alias("band_key"),
    )


def _lsh_grouped_buckets(
    spark: SparkSession, sf_dir: str, cap: int = LSH_BUCKET_CAP, hash_fn: str = "md5"
) -> tuple[DataFrame, DataFrame]:
    """(pair-expandable buckets, flagged template clusters).

    Buckets with 2..cap members go to pair expansion; buckets above
    the cap are the degenerate "template cluster" side-output —
    returned as (band, band_key, n_docs, sample_ids) so the pipeline
    can count/report them without ever paying the quadratic expansion.

    Bounded memory by construction: bucket sizes come from a COUNT
    window over (band, band_key), and the cap filter runs BEFORE any
    ``collect_set`` — so no aggregation ever materializes an
    oversized bucket's id array (a 10^6-doc template bucket would be
    an 8 MB single row under collect-then-filter). The window and
    the aggregate share the (band, band_key) hash partitioning, so
    it's still exactly ONE shuffle of (16-byte key, doc_id); the
    flagged sample is row_number-capped at 10 ids pre-aggregation."""
    from pyspark.sql import Window as W  # noqa: PLC0415

    bands = _lsh_band_keys(spark, sf_dir, hash_fn=hash_fn)
    w = W.partitionBy("band", "band_key").orderBy("doc_id")
    sized = bands.select(
        "band",
        "band_key",
        "doc_id",
        F.count(F.lit(1)).over(
            w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        ).alias("_n"),
        F.row_number().over(w).alias("_rn"),
    )
    ok = (
        sized.filter((F.col("_n") > 1) & (F.col("_n") <= cap))
        .groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
    )
    flagged = (
        sized.filter((F.col("_n") > cap) & (F.col("_rn") <= 10))
        .groupBy("band", "band_key")
        .agg(
            F.first("_n").alias("n_docs"),
            F.sort_array(F.collect_set("doc_id")).alias("sample_ids"),
        )
    )
    return ok, flagged


def lsh_template_clusters(
    spark: SparkSession, sf_dir: str, cap: int = LSH_BUCKET_CAP,
    hash_fn: str = "md5",
) -> DataFrame:
    """Flagged degenerate LSH buckets (template clusters) — the
    side-output companion to `dedup_minhash_lsh`. Pass the SAME
    ``hash_fn`` as the dedup run: bucket membership depends on the
    hash, so an md5 flag report does not describe the buckets an
    xxhash64 run excluded (review r11)."""
    return _lsh_grouped_buckets(spark, sf_dir, cap, hash_fn=hash_fn)[1]


# CTE chain: minhash → LSH buckets → candidate pairs → exact
# jaccard ≥ 0.5 → recursive-CTE transitive closure (the components
# oracle for dedup_ngram_jaccard's star-clustered output)
_JACCARD_COMPS_ORACLE_PREFIX = f"""
    {MINHASH_SQL},
    bands AS (
      SELECT doc_id, b.i AS band,
             md5(array_to_string(sig[b.i * {BAND_SIZE} + 1 : (b.i + 1) * {BAND_SIZE}], ',')) AS band_key
      FROM sigs CROSS JOIN (SELECT UNNEST(range(0, {N_HASHES // BAND_SIZE})) AS i) b
    ),
    ok AS (
      SELECT band, band_key FROM bands GROUP BY band, band_key
      HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {LSH_BUCKET_CAP}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN ok USING (band, band_key)
      JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
      FROM cand c
      JOIN sh s1 ON s1.doc_id = c.doc_a
      JOIN sh s2 ON s2.doc_id = c.doc_b AND s2.shingle = s1.shingle
      GROUP BY c.doc_a, c.doc_b
    ),
    pairs AS (
      SELECT i.doc_a, i.doc_b,
             CAST(i.n_common AS DOUBLE) / (ca.n + cb.n - i.n_common) AS jaccard
      FROM inter i
      JOIN counts ca ON ca.doc_id = i.doc_a
      JOIN counts cb ON cb.doc_id = i.doc_b
      WHERE CAST(i.n_common AS DOUBLE) / (ca.n + cb.n - i.n_common) >= 0.5
    ),
    sym AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
      UNION SELECT doc_a, doc_a FROM pairs
      UNION SELECT doc_b, doc_b FROM pairs
    ),
    reach AS (
      SELECT src, dst FROM sym
      UNION
      SELECT r.src, e.dst FROM reach r JOIN sym e ON r.dst = e.src
    ),
    comps AS (SELECT src AS doc_id, min(dst) AS comp FROM reach GROUP BY src),
    csize AS (SELECT comp, count(*) AS cluster_size FROM comps GROUP BY comp)
"""


@register(
    "dedup_ngram_jaccard",
    oracle=_JACCARD_COMPS_ORACLE_PREFIX + """    SELECT p.doc_a, p.doc_b, p.jaccard, c.comp, z.cluster_size
    FROM pairs p
    JOIN comps c ON c.doc_id = p.doc_a
    JOIN csize z USING (comp)
    ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard verification of LSH candidate pairs.

    Join candidates back to the shingle table (shuffle on doc_id /
    shingle — both bounded), count intersections, compute exact
    jaccard, keep >= 0.5 — the verify stage after dedup_minhash_lsh's
    recall stage — then transitively cluster the surviving pairs so
    each pair carries its component's canonical id and size (oracle:
    DuckDB recursive closure).

    Clustering here runs the large-star/small-star route
    (`near_dup_components_star`, r12) so the driver's oracle gate
    exercises it every round; the min-label-propagation route
    (`near_dup_components`) stays oracle-gated through
    sim_embedding_neardup's entry — BOTH algorithms are checked
    against DuckDB recursive-CTE closures without growing the
    registry past the driver's ~50-entry sample
    (test_registry_fits_driver_sample). test_components_star pins
    their equivalence directly.
    """
    pairs = _verified_jaccard_pairs(spark, sf_dir)
    # transitive clustering of the verified pairs (the canonical-doc
    # step): comp is identical for both pair sides by construction, so
    # one join on doc_a proves full connected-component correctness
    # plain shuffle join: comps is one row per participating doc —
    # corpus-proportional, NOT broadcast-safe at scale
    comps = near_dup_components_star(pairs).withColumnRenamed("doc_id", "doc_a")
    return pairs.join(comps, "doc_a").select(
        "doc_a", "doc_b", "jaccard", "comp", "cluster_size"
    )


def _verified_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared verify-stage pipeline: LSH candidates → exact
    n-gram Jaccard ≥ 0.5, localCheckpoint'ed once (the result feeds
    BOTH the component propagation and any final join — re-deriving
    would re-run the whole shingle/LSH/jaccard pipeline)."""
    cand = dedup_minhash_lsh(spark, sf_dir)
    sh = shingles(load_fanout_table(spark, sf_dir, "documents"))
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    s1 = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    s2 = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(s1, "doc_a")
        .join(s2, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    pairs = (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )
    return pairs.localCheckpoint()


def near_dup_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over verified near-duplicate pairs — the
    step every dedup pipeline needs after pair generation: transitive
    clusters with one canonical representative (min doc_id) per
    component, so "keep one copy per cluster" is a single filter.

    Min-label propagation: each vertex starts as its own label and
    repeatedly takes the minimum label over its neighborhood until a
    fixpoint. One shuffle per round, labels truncated with
    localCheckpoint (iterative lineage would otherwise grow
    unboundedly), convergence detected by the monotone label-sum
    (labels only decrease). Rounds needed = graph diameter — near-dup
    clusters are shallow (template clusters are star-shaped), so this
    converges in 2-3 rounds; at adversarial 100 TB diameters swap in
    the large-star/small-star contraction, which is the same loop
    shape with two extra map steps.

    Input: (doc_a, doc_b) pairs; output: (doc_id, comp,
    cluster_size), comp = min doc_id of the component.
    """
    sym = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    # materialize the edge list once — each propagation round re-reads
    # it, and its lineage is the full upstream pair pipeline
    sym = sym.localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("comp", F.col("doc_id"))
        .localCheckpoint()
    )
    prev_sum, converged = None, False
    for _ in range(max_iter):
        neigh = sym.join(
            labels.withColumnRenamed("doc_id", "src"), "src"
        ).select(F.col("dst").alias("doc_id"), "comp")
        labels = (
            labels.select("doc_id", "comp")
            .union(neigh)
            .groupBy("doc_id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        cur = labels.agg(F.sum("comp")).collect()[0][0]
        if cur == prev_sum:
            converged = True
            break
        prev_sum = cur
    if not converged:
        # surface it, don't return silently-split components (same
        # observability contract as the streaming MR buffer cap)
        import logging  # noqa: PLC0415

        logging.getLogger(__name__).warning(
            "near_dup_components did not converge within max_iter=%d "
            "rounds — components with diameter > max_iter are split; "
            "raise max_iter or use near_dup_components_star (round "
            "count bound by log n, not diameter)",
            max_iter,
        )
    sizes = labels.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "comp").select("doc_id", "comp", "cluster_size")


def near_dup_components_star(edges: DataFrame, max_iter: int = 30) -> DataFrame:
    """Connected components via alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC'14) — the adversarial-diameter scale path
    SCALE.md promises: min-label propagation needs DIAMETER rounds
    (a 10^6-node chain = 10^6 shuffles), star contraction converges
    in O(log n) rounds regardless of topology.

    One round = large-star ∘ small-star, each a single hash
    partitioning of the edge list by node with a window MIN — two
    shuffles per round, no driver-side state beyond an O(1)
    convergence checksum. Same output contract as
    ``near_dup_components``: (doc_id, comp=min doc_id of the
    component, cluster_size).

    - large-star: every neighbor v > u links to m = min(Γ(u) ∪ {u})
      (strictly-larger nodes hop toward the minimum; keeps the graph
      connected while halving long chains),
    - small-star: edges pointed at the larger endpoint; all smaller
      neighbors AND u itself link to the minimum (contracts local
      stars onto their root).
    Fixpoint: the edge set is exactly {(node, root)} — stable under
    both operations; detected by an order-insensitive xxhash64
    checksum (count + hash-sum), one tiny collect per round.
    """
    from pyspark.sql import Window as W  # noqa: PLC0415

    u, v = F.col("u"), F.col("v")
    e = (
        edges.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .filter(u != v)
        .distinct()
        .localCheckpoint()
    )
    prev_sig, converged = None, False
    for _ in range(max_iter):
        # large-star over the symmetrized adjacency
        sym = e.union(e.select(v.alias("u"), u.alias("v")))
        wu = W.partitionBy("u")
        m = F.least(F.min("v").over(wu), u)
        e = (
            sym.select("u", "v", m.alias("m"))
            .filter(v > u)
            .select(v.alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star over edges directed at the larger endpoint
        directed = e.select(
            F.greatest(u, v).alias("u"), F.least(u, v).alias("v")
        )
        wb = W.partitionBy("u")
        mb = F.min("v").over(wb)  # all neighbors < u ⇒ min(N ∪ {u})
        halves = directed.select("u", "v", mb.alias("m"))
        e = (
            halves.select(v.alias("u"), F.col("m").alias("v"))
            .union(halves.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        sig = e.agg(
            F.count(F.lit(1)),
            # decimal accumulator: a long sum of 64-bit hashes
            # overflows under ANSI arithmetic
            F.sum(F.xxhash64(F.col("u"), F.col("v")).cast("decimal(38,0)")),
        ).collect()[0]
        if tuple(sig) == prev_sig:
            converged = True
            break
        prev_sig = tuple(sig)
    if not converged:
        import logging  # noqa: PLC0415

        logging.getLogger(__name__).warning(
            "near_dup_components_star did not converge within "
            "max_iter=%d rounds",
            max_iter,
        )
    # fixpoint edges are (node, root); roots carry themselves
    labels = e.select(F.col("u").alias("doc_id"), F.col("v").alias("comp")).union(
        e.select(F.col("v").alias("doc_id"), F.col("v").alias("comp")).distinct()
    )
    sizes = labels.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "comp").select("doc_id", "comp", "cluster_size")


@register(
    "dedup_simhash",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, UNNEST(list_distinct(string_split({NORMALIZED_SQL}, ' '))) AS word
      FROM documents
    ),
    bits AS (
      SELECT doc_id, b.i AS bit,
             CASE WHEN substring(md5(word), CAST(b.i // 4 AS INTEGER) + 1, 1) IN
                       ('8','9','a','b','c','d','e','f') AND b.i % 4 = 0
                  OR substring(md5(word), CAST(b.i // 4 AS INTEGER) + 1, 1) IN
                       ('4','5','6','7','c','d','e','f') AND b.i % 4 = 1
                  OR substring(md5(word), CAST(b.i // 4 AS INTEGER) + 1, 1) IN
                       ('2','3','6','7','a','b','e','f') AND b.i % 4 = 2
                  OR substring(md5(word), CAST(b.i // 4 AS INTEGER) + 1, 1) IN
                       ('1','3','5','7','9','b','d','f') AND b.i % 4 = 3
                  THEN 1 ELSE -1 END AS v
      FROM words CROSS JOIN (SELECT UNNEST(range(0, 16)) AS i) b
    )
    SELECT doc_id,
           array_to_string(list(CASE WHEN s > 0 THEN '1' ELSE '0' END ORDER BY bit), '') AS simhash
    FROM (SELECT doc_id, bit, SUM(v) AS s FROM bits GROUP BY doc_id, bit)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (16-bit here; 64-bit in production) over distinct words.

    Bit i of the signature = sign of Σ_words (±1 by bit i of
    md5(word)). Expressed as explode(word)×explode(bit)→groupBy —
    pure shuffle-reduce, linear scale. Hamming-close signatures =
    near-dups; signatures are grouped by bit-bands downstream exactly
    like MinHash-LSH.
    """
    docs = load_fanout_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(normalized_text(), " "))).alias("word"),
    )
    bitval = F.expr(
        "(shiftright(CAST(conv(substring(md5(word), CAST(bit DIV 4 AS INT) + 1, 1), 16, 10)"
        " AS INT), CAST(3 - bit % 4 AS INT)) & 1)"
    )
    return (
        words.withColumn("bit", F.explode(F.sequence(F.lit(0), F.lit(15))))
        .withColumn("v", F.when(bitval == 1, 1).otherwise(-1))
        .groupBy("doc_id", "bit")
        .agg(F.sum("v").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("bit", F.when(F.col("s") > 0, "1").otherwise("0").alias("c")))
                    ),
                    lambda e: e["c"],
                ),
            ).alias("simhash")
        )
    )


def winnow_fingerprints(
    df: DataFrame, k: int = SHINGLE_K, window: int = 4, text_col: str = "text"
) -> DataFrame:
    """Rolling-hash winnowing fingerprints (the MOSS scheme): hash
    every word k-gram, slide a ``window`` over consecutive k-gram
    hashes, keep each window's minimum — any two documents sharing a
    run of at least ``window + k - 1`` words are GUARANTEED to share
    a fingerprint, unlike the whole-document fingerprint in
    `text_metrics` which only clusters full reorder-edits.

    Scale shape: intentionally keeps the posexplode + lead-window
    form (unlike `shingles`, which moved to the shuffle-free
    explode(sequence)+slice) because winnowing needs per-POSITION
    k-gram hashes for the sliding min frame; the window-min frame
    then runs over the already-partitioned hashes — Catalyst reuses
    the doc_id exchange, so it is still one token-stream shuffle;
    collect_set per doc is bounded by shingles/window.

    Output: (doc_id, fingerprints array<string> sorted).
    """
    from pyspark.sql import Window as W  # noqa: PLC0415

    words = F.split(normalized_text(text_col), " ")
    wdf = df.select("doc_id", F.posexplode(words).alias("pos", "w"))
    win = W.partitionBy("doc_id").orderBy("pos")
    lead_cols = [F.lead("w", i).over(win) for i in range(1, k)]
    grams = (
        wdf.select(
            "doc_id",
            "pos",
            F.concat_ws(" ", F.col("w"), *lead_cols).alias("shingle"),
            F.lead("w", k - 1).over(win).alias("_last"),
        )
        .filter(F.col("_last").isNotNull() | (F.col("pos") == 0))
        .select("doc_id", "pos", F.md5("shingle").alias("h"))
    )
    frame = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    return (
        grams.withColumn("wmin", F.min("h").over(frame))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("wmin")).alias("fingerprints"))
    )
