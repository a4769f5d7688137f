"""Scalar-function coverage batteries (SURVEY.md §2.10).

One oracle-checked query per function family — string, math,
datetime, collection, JSON, hash — each exercising the Flink
built-ins the corpus declares (test/syntax-test.fsql:351-461) through
their Spark equivalents. All pure projections: no shuffle, trivially
scale-safe; the point is cross-engine semantic parity.

Cross-engine notes (empirically verified):
- exp/sin/cos/pow/sqrt/round are bit-identical Spark↔DuckDB on the
  fixture data; ln/log10/cbrt differ by 1 ulp on some inputs (libm
  differences) → those live in the rows-only ``func_math_libm``.
- Spark DAYOFWEEK is 1=Sunday; DuckDB is 0=Sunday → oracle adds 1.
- array_distinct/union/except order is engine-specific → always
  sorted before output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_sql_toolkit_spark.functions import ref_hashes
from flink_sql_toolkit_spark.operators.registry import register
from flink_sql_toolkit_spark.tables import load_table


@register(
    "func_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up, lower(p_brand) AS lo,
           trim(concat(' ', p_name, ' ')) AS trimmed,
           substring(p_name, 2, 5) AS sub,
           replace(p_name, 'a', '#') AS repl,
           lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '*') AS rp,
           reverse(p_type) AS rev,
           repeat(left(p_brand, 2), 3) AS rep,
           translate(p_name, 'ae', '43') AS tr,
           ascii(p_brand) AS asc_, chr(CAST(65 + p_partkey % 26 AS INTEGER)) AS ch,
           length(p_name) AS len, position('a' IN p_name) AS pos,
           split_part(p_type, ' ', 1) AS sp1,
           concat_ws('-', p_brand, p_type) AS cw,
           levenshtein(p_brand, left(p_type, 5)) AS lev,
           left(p_name, 4) AS l4, right(p_name, 4) AS r4
    FROM part ORDER BY p_partkey
    """,
)
def func_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPPER/LOWER/TRIM/SUBSTRING/REPLACE/LPAD/RPAD/REVERSE/REPEAT/
    TRANSLATE/ASCII/CHR/CHAR_LENGTH/POSITION/SPLIT_INDEX/CONCAT_WS/
    LEVENSHTEIN/LEFT/RIGHT (syntax-test.fsql:351-374)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.substring("p_name", 2, 5).alias("sub"),
        F.replace(F.col("p_name"), F.lit("a"), F.lit("#")).alias("repl"),
        F.lpad("p_brand", 12, "*").alias("lp"),
        F.rpad("p_brand", 12, "*").alias("rp"),
        F.reverse("p_type").alias("rev"),
        F.repeat(F.left("p_brand", F.lit(2)), 3).alias("rep"),
        F.translate("p_name", "ae", "43").alias("tr"),
        F.ascii("p_brand").alias("asc_"),
        F.chr(F.lit(65) + F.col("p_partkey") % 26).alias("ch"),
        F.length("p_name").alias("len"),
        F.locate("a", "p_name").alias("pos"),
        F.element_at(F.split("p_type", " "), 1).alias("sp1"),
        F.concat_ws("-", "p_brand", "p_type").alias("cw"),
        F.levenshtein("p_brand", F.left("p_type", F.lit(5))).alias("lev"),
        F.left("p_name", F.lit(4)).alias("l4"),
        F.right("p_name", F.lit(4)).alias("r4"),
    ).orderBy("p_partkey")


@register(
    "func_math",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey,
           abs(l_discount - 0.05) AS ab,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg,
           CAST(ceil(l_extendedprice / 100) AS BIGINT) AS ce,
           CAST(floor(l_extendedprice / 100) AS BIGINT) AS fl,
           round(l_extendedprice / 7, 2) AS rd,
           sqrt(l_extendedprice) AS sq,
           exp(l_discount) AS ex,
           sin(l_discount) AS si, cos(l_tax) AS co,
           pow(l_quantity, 2) AS pw,
           mod(CAST(l_quantity AS BIGINT), 7) AS md,
           degrees(l_discount) AS dg, radians(l_tax) AS ra,
           pi() AS pi_,
           CAST(l_quantity AS BIGINT) & 12 AS ba,
           CAST(l_quantity AS BIGINT) | 5 AS bo,
           xor(CAST(l_quantity AS BIGINT), 9) AS bx
    FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber, l_partkey
    """,
)
def func_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABS/SIGN/CEIL/FLOOR/ROUND/SQRT/EXP/SIN/COS/POWER/MOD/DEGREES/
    RADIANS/PI/BITAND/BITOR/BITXOR (syntax-test.fsql:377-401).
    ln/log10/cbrt are in func_math_libm (rows-only; libm ulp
    divergence across engines). Oracle casts sign→DOUBLE and
    ceil/floor→BIGINT: DuckDB returns TINYINT/DOUBLE where Spark
    returns DOUBLE/BIGINT — values identical, types not."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    q = F.col("l_quantity").cast("bigint")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.abs(F.col("l_discount") - 0.05).alias("ab"),
        F.signum(F.col("l_discount") - 0.05).alias("sg"),
        F.ceil(F.col("l_extendedprice") / 100).alias("ce"),
        F.floor(F.col("l_extendedprice") / 100).alias("fl"),
        F.round(F.col("l_extendedprice") / 7, 2).alias("rd"),
        F.sqrt("l_extendedprice").alias("sq"),
        F.exp("l_discount").alias("ex"),
        F.sin("l_discount").alias("si"),
        F.cos("l_tax").alias("co"),
        F.pow("l_quantity", F.lit(2)).alias("pw"),
        (q % 7).alias("md"),
        F.degrees("l_discount").alias("dg"),
        F.radians("l_tax").alias("ra"),
        F.lit(3.141592653589793).alias("pi_"),
        q.bitwiseAND(F.lit(12)).alias("ba"),
        q.bitwiseOR(F.lit(5)).alias("bo"),
        q.bitwiseXOR(F.lit(9)).alias("bx"),
    ).orderBy("l_orderkey", "l_linenumber", "l_partkey")


@register(
    "func_math_libm",
    # JVM and DuckDB libm implementations differ by 1 ulp (16th
    # significant digit); both sides format to 6 decimals so the
    # comparison checks ~7 significant digits — far above ulp noise,
    # far below any real implementation bug. Exact .5 ties at the
    # 6th decimal (where HALF_UP vs round-to-even could split) are
    # unreachable for transcendental outputs of double inputs.
    oracle="""
    SELECT l_orderkey, l_linenumber,
           printf('%.6f', ln(CAST(l_extendedprice AS DOUBLE)))    AS ln_,
           printf('%.6f', log10(CAST(l_extendedprice AS DOUBLE))) AS l10,
           printf('%.6f', log2(CAST(l_extendedprice AS DOUBLE)))  AS l2,
           printf('%.6f', cbrt(CAST(l_extendedprice AS DOUBLE)))  AS cb,
           printf('%.6f', tan(CAST(l_discount AS DOUBLE)))        AS tn,
           printf('%.6f', atan(CAST(l_discount AS DOUBLE)))       AS at,
           printf('%.6f', cot(CAST(l_discount AS DOUBLE) + 0.01)) AS ct,
           -- DuckDB 1.0 has no tanh(); (e^2x-1)/(e^2x+1) agrees with
           -- libm tanh to well under the 6-decimal comparison grain
           printf('%.6f', (exp(2 * CAST(l_discount AS DOUBLE)) - 1)
                        / (exp(2 * CAST(l_discount AS DOUBLE)) + 1)) AS th
    FROM lineitem WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber
    """,
)
def func_math_libm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LN/LOG10/LOG2/CBRT/TAN/ATAN/COT/TANH (syntax-test.fsql:377-401)
    — diffed against DuckDB through fixed 6-decimal formatting on
    both sides (see oracle comment on the ulp rationale)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    price = F.col("l_extendedprice").cast("double")
    disc = F.col("l_discount").cast("double")
    fmt = lambda c: F.format_string("%.6f", c)  # noqa: E731
    return li.select(
        "l_orderkey",
        "l_linenumber",
        fmt(F.log(price)).alias("ln_"),
        fmt(F.log10(price)).alias("l10"),
        fmt(F.log2(price)).alias("l2"),
        fmt(F.cbrt(price)).alias("cb"),
        fmt(F.tan(disc)).alias("tn"),
        fmt(F.atan(disc)).alias("at"),
        fmt(F.expr("cot(CAST(l_discount AS DOUBLE) + 0.01)")).alias("ct"),
        fmt(F.tanh(disc)).alias("th"),
    ).orderBy("l_orderkey", "l_linenumber")


def func_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YEAR/QUARTER/MONTH/DAYOFMONTH/DAYOFWEEK/DAYOFYEAR/WEEK/
    DATE_TRUNC/TIMESTAMPADD/LAST_DAY/TIMESTAMPDIFF/UNIX_TIMESTAMP
    (syntax-test.fsql:404-429). Spark DAYOFWEEK is 1=Sunday vs
    DuckDB 0=Sunday — oracle compensates."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.quarter(d).alias("q"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.dayofweek(d).alias("dw"),
        F.dayofyear(d).alias("dy"),
        F.weekofyear(d).alias("wk"),
        F.date_trunc("month", d).alias("mstart"),
        (d + F.expr("INTERVAL 5 DAY")).alias("plus5"),
        (d - F.expr("INTERVAL 3 MONTH")).alias("minus3m"),
        F.last_day(d.cast("date")).cast("timestamp").alias("ld"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp")).alias("dd"),
        F.unix_timestamp(d).alias("ep"),
        # TIME battery (Spark 4.1 TimeType; Flink TIME/MAKE_TIME/
        # EXTRACT — syntax-test.fsql:411): constructed from the key so
        # the values vary per row
        F.expr(
            "make_time(CAST(o_orderkey % 24 AS INT),"
            " CAST(o_orderkey % 60 AS INT),"
            " CAST(o_orderkey % 60 AS INT))"
        ).alias("tm"),
        F.expr("hour(make_time(CAST(o_orderkey % 24 AS INT), 0, 0))").alias("t_hr"),
        F.expr(
            "CAST(make_time(CAST(o_orderkey % 24 AS INT),"
            " CAST(o_orderkey % 60 AS INT), 0) AS STRING)"
        ).alias("t_str"),
        F.expr(
            "make_time(CAST(o_orderkey % 24 AS INT), 0, 0) < TIME'12:00:00'"
        ).alias("t_am"),
    ).orderBy("o_orderkey")


@register(
    "func_collection",
    oracle="""
    WITH t AS (
      SELECT n_nationkey, [n_name, r_name, 'zz'] AS arr,
             string_split(n_name, 'A') AS parts
      FROM nation JOIN region ON n_regionkey = r_regionkey
    )
    SELECT n_nationkey,
           len(arr) AS card,
           arr[2] AS second_elem,
           list_contains(arr, 'zz') AS has_zz,
           list_position(arr, 'zz') AS pos_zz,
           array_to_string(list_sort(list_distinct(arr)), '|') AS dedup_sorted,
           array_to_string(arr, '|') AS joined,
           list_max(arr) AS mx, list_min(arr) AS mn,
           array_to_string(list_sort(arr), '|') AS sorted_arr,
           array_to_string(arr[1:2], '|') AS sliced,
           array_to_string(list_reverse(arr), '|') AS rev,
           len(parts) AS n_parts,
           array_to_string(flatten([arr, parts]), '|') AS flat
    FROM t ORDER BY n_nationkey
    """,
)
def func_collection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CARDINALITY/element access/ARRAY_CONTAINS/ARRAY_POSITION/
    ARRAY_DISTINCT/ARRAY_JOIN/ARRAY_MAX/MIN/ARRAY_SORT/ARRAY_SLICE/
    ARRAY_REVERSE/FLATTEN (syntax-test.fsql:450-461). Flink index
    access is 1-based → element_at. Array-typed outputs are
    array_join'd to '|' strings on BOTH sides: the driver's row
    hasher cannot hash Python lists (round-1 red row)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    t = nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")).select(
        "n_nationkey",
        F.array(F.col("n_name"), F.col("r_name"), F.lit("zz")).alias("arr"),
        F.split("n_name", "A").alias("parts"),
    )
    return t.select(
        "n_nationkey",
        F.size("arr").alias("card"),
        F.element_at("arr", 2).alias("second_elem"),
        F.array_contains("arr", "zz").alias("has_zz"),
        F.array_position("arr", "zz").alias("pos_zz"),
        F.array_join(F.array_sort(F.array_distinct("arr")), "|").alias("dedup_sorted"),
        F.array_join("arr", "|").alias("joined"),
        F.array_max("arr").alias("mx"),
        F.array_min("arr").alias("mn"),
        F.array_join(F.array_sort("arr"), "|").alias("sorted_arr"),
        F.array_join(F.slice("arr", 1, 2), "|").alias("sliced"),
        F.array_join(F.reverse("arr"), "|").alias("rev"),
        F.size("parts").alias("n_parts"),
        F.array_join(F.flatten(F.array(F.col("arr"), F.col("parts"))), "|").alias("flat"),
    ).orderBy("n_nationkey")


def func_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_VALUE/JSON_EXISTS/IS_JSON and friends
    (syntax-test.fsql:371-372) via get_json_object/json paths."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_path"),
        F.expr("try_parse_json(props) IS NOT NULL").alias("is_valid"),
        F.json_array_length(F.lit("[1,2,3]")).alias("arr_len"),
        # IS_JSON_<type> family (r9 grammar audit; shims.py bodies):
        # props is an object → ij_obj true / ij_arr false per row;
        # SCALAR is exercised on a per-row alternation of an int and
        # a quoted-string JSON text (extraction-based probes diverge:
        # Spark's get_json_object strips JSON string quoting while
        # DuckDB's json_extract keeps it — review r9)
        F.expr("json_object_keys(props) IS NOT NULL").alias("ij_obj"),
        F.expr("json_array_length(props) IS NOT NULL").alias("ij_arr"),
        F.expr(
            "try_parse_json(CASE WHEN event_id % 3 = 0 THEN '123' "
            "WHEN event_id % 3 = 1 THEN '\"s\"' ELSE '[1]' END) IS NOT NULL "
            "AND json_array_length(CASE WHEN event_id % 3 = 0 THEN '123' "
            "WHEN event_id % 3 = 1 THEN '\"s\"' ELSE '[1]' END) IS NULL "
            "AND json_object_keys(CASE WHEN event_id % 3 = 0 THEN '123' "
            "WHEN event_id % 3 = 1 THEN '\"s\"' ELSE '[1]' END) IS NULL"
        ).alias("ij_scl"),
    ).orderBy("event_id")


@register(
    "func_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256,
           to_base64(CAST(left(text, 48) AS BLOB)) AS b64,
           CAST(from_base64(to_base64(CAST(left(text, 48) AS BLOB))) AS VARCHAR) AS roundtrip
    FROM documents WHERE doc_id < 50 ORDER BY doc_id
    """,
)
def func_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MD5/SHA256/TO_BASE64/FROM_BASE64 (syntax-test.fsql:366-370;
    SHA1/CRC32/MURMUR exist Spark-side but DuckDB lacks them —
    covered by func_hash_extra rows-only)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        # 48-char payloads: Spark's base64 MIME-chunks beyond 76 chars
        # (inserts CRLF) while DuckDB never does
        F.base64(F.left(F.col("text"), F.lit(48)).cast("binary")).alias("b64"),
        F.unbase64(F.base64(F.left(F.col("text"), F.lit(48)).cast("binary")))
        .cast("string")
        .alias("roundtrip"),
    ).orderBy("doc_id")


def func_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REGEXP_REPLACE/REGEXP_EXTRACT/REGEXP (syntax-test.fsql:358-360).

    Patterns kept inside the Java-regex ∩ RE2 common subset (no
    backrefs/lookahead) so both engines agree; Spark's
    regexp_replace is global like DuckDB's 'g' flag.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    head = F.left(F.col("text"), F.lit(60))
    return docs.select(
        "doc_id",
        F.regexp_replace(head, "[aeiou]", "*").alias("vowels_masked"),
        F.regexp_extract(head, "([a-z]+)", 1).alias("first_word"),
        F.col("text").rlike("data").alias("has_data"),
        F.regexp_replace(F.col("lang"), "^(e)", "E").alias("lang_cap"),
    ).orderBy("doc_id")


def func_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST / TRY_CAST / IF / IFNULL (syntax-test.fsql:432-447).

    TRY_CAST of malformed input → NULL in both engines. Spark's
    double→bigint CAST truncates toward zero while DuckDB's rounds —
    the oracle applies trunc() first to state the same semantics.
    """
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return orders.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.lit("100").cast("int").alias("lit_int"),
        F.expr("TRY_CAST(o_orderpriority AS INT)").alias("bad_int"),
        F.expr("TRY_CAST(substring(o_orderpriority, 1, 1) AS INT)").alias("prio_num"),
        F.col("o_totalprice").cast("bigint").alias("price_trunc"),
        F.when(F.col("o_orderstatus") == "O", "open").otherwise("closed").alias("status_if"),
        F.coalesce(F.expr("TRY_CAST(o_orderpriority AS INT)"), F.lit(-1)).alias("with_default"),
    ).orderBy("o_orderkey")


@register(
    "func_string_extra",
    # DuckDB lacks these functions natively; the oracle reconstructs
    # each from primitives so the entry is differential after all:
    #   OVERLAY        -> substr splice
    #   INITCAP        -> per-word upper(head)||lower(tail)
    #   FORMAT_STRING  -> printf
    #   PARSE_URL QUERY-> regexp after '?'
    #   WIDTH_BUCKET   -> closed-form bucket arithmetic (double math
    #                     identical to Spark's (v-lo)/((hi-lo)/n))
    #   FACTORIAL      -> factorial() (hugeint -> BIGINT)
    oracle=r"""
    SELECT p_partkey,
           substr(p_name, 1, 1) || 'XX' || substr(p_name, 4) AS ov,
           array_to_string(
             list_transform(str_split(p_name, ' '),
                            x -> upper(substr(x, 1, 1)) || lower(substr(x, 2))),
             ' ') AS ic,
           printf('%s=%d', p_brand, p_size) AS fmt,
           regexp_extract('https://example.com/p?id=' || CAST(p_partkey AS VARCHAR),
                          '\?(.*)$', 1) AS query_part,
           CASE WHEN CAST(p_retailprice AS DOUBLE) < 0.0 THEN 0
                WHEN CAST(p_retailprice AS DOUBLE) >= 2000.0 THEN 11
                ELSE CAST(floor(CAST(p_retailprice AS DOUBLE) / (2000.0 / 10)) AS BIGINT) + 1
           END AS wb,
           CAST(factorial(p_size % 10) AS BIGINT) AS fact
    FROM part WHERE p_partkey < 50 ORDER BY p_partkey
    """,
)
def func_string_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OVERLAY/INITCAP/FORMAT/PARSE_URL/WIDTH_BUCKET/FACTORIAL
    (syntax-test.fsql:361-365,377-401). SOUNDEX lives in the rows-only
    ``func_hash_extra`` (no tractable DuckDB reconstruction)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 50)
    return part.select(
        "p_partkey",
        F.overlay("p_name", F.lit("XX"), 2, 2).alias("ov"),
        F.initcap("p_name").alias("ic"),
        F.format_string("%s=%d", F.col("p_brand"), F.col("p_size")).alias("fmt"),
        F.parse_url(
            F.concat(F.lit("https://example.com/p?id="), F.col("p_partkey").cast("string")),
            F.lit("QUERY"),
        ).alias("query_part"),
        F.width_bucket(F.col("p_retailprice"), F.lit(0.0), F.lit(2000.0), F.lit(10)).alias("wb"),
        F.factorial(F.col("p_size") % 10).alias("fact"),
    ).orderBy("p_partkey")


# Soundex probe names: classic test vectors (Ashcraft exercises the
# H-transparency rule; Tymczak the vowel-separator rule).
_SOUNDEX_NAMES = ("Robert", "Rupert", "Ashcraft", "Tymczak", "Pfister", "Honeyman")


def _hash_extra_oracle() -> str:
    """DuckDB 1.0 has no sha1/crc32/murmur3/xxh64/soundex, so the
    oracle embeds expected values computed by the from-spec
    pure-Python implementations in ``functions/ref_hashes.py``
    (themselves differentially pinned against Spark in
    tests/test_operators.py). Inputs are deterministic in doc_id —
    ``fstk-<doc_id>`` — so the literals hold at every SF; joining
    back to ``documents`` keeps the row set honest."""
    rows = []
    for doc_id in range(50):
        data = f"fstk-{doc_id}".encode()
        name = _SOUNDEX_NAMES[doc_id % len(_SOUNDEX_NAMES)]
        rows.append(
            f"({doc_id}, '{ref_hashes.sha1_hex(data)}', "
            f"{ref_hashes.crc32_long(data)}, {ref_hashes.murmur3_32(data)}, "
            f"{ref_hashes.xxh64(data)}, '{ref_hashes.soundex(name)}')"
        )
    return f"""
    SELECT d.doc_id, e.h_sha1, e.h_crc32, e.h_murmur, e.h_xxh64, e.sx
    FROM documents d
    JOIN (VALUES {", ".join(rows)})
      AS e(doc_id, h_sha1, h_crc32, h_murmur, h_xxh64, sx)
      ON e.doc_id = d.doc_id
    WHERE d.doc_id < 50 ORDER BY d.doc_id
    """


@register("func_hash_extra", oracle=_hash_extra_oracle())
def func_hash_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHA1/CRC32/HASH_CODE(murmur3)/XXHASH64/SOUNDEX
    (syntax-test.fsql:366-370) over doc_id-derived strings, diffed
    against independently computed literals (see
    ``_hash_extra_oracle``)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    s = F.concat(F.lit("fstk-"), F.col("doc_id").cast("string"))
    name = F.element_at(
        F.array(*[F.lit(n) for n in _SOUNDEX_NAMES]),
        (F.col("doc_id") % len(_SOUNDEX_NAMES) + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        F.sha1(s).alias("h_sha1"),
        F.crc32(s.cast("binary")).alias("h_crc32"),
        F.hash(s).alias("h_murmur"),
        F.xxhash64(s).alias("h_xxh64"),
        F.soundex(name).alias("sx"),
    ).orderBy("doc_id")


@register(
    "func_cast_datetime",
    # the CAST/TRY_CAST/IF/IFNULL battery and the datetime battery
    # select over the SAME orders slice (o_orderkey < 200), so the
    # merge is one column-wise join on o_orderkey — one driver entry
    # proves both scalar families
    oracle="""
    SELECT c.o_orderkey,
           c.key_str, c.lit_int, c.bad_int, c.prio_num, c.price_trunc,
           c.status_if, c.with_default,
           d.y, d.q, d.m, d.d, d.dw, d.dy, d.wk, d.mstart, d.plus5,
           d.minus3m, d.ld, d.dd, d.ep, d.tm, d.t_hr, d.t_str, d.t_am
    FROM (
      SELECT o_orderkey,
             CAST(o_orderkey AS VARCHAR) AS key_str,
             CAST('100' AS INTEGER) AS lit_int,
             TRY_CAST(o_orderpriority AS INTEGER) AS bad_int,
             TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
             CAST(trunc(o_totalprice) AS BIGINT) AS price_trunc,
             IF(o_orderstatus = 'O', 'open', 'closed') AS status_if,
             IFNULL(TRY_CAST(o_orderpriority AS INTEGER), -1) AS with_default
      FROM orders WHERE o_orderkey < 200
    ) c JOIN (
      SELECT o_orderkey,
             year(o_orderdate) AS y, quarter(o_orderdate) AS q,
             month(o_orderdate) AS m, day(o_orderdate) AS d,
             dayofweek(o_orderdate) + 1 AS dw,
             dayofyear(o_orderdate) AS dy,
             weekofyear(o_orderdate) AS wk,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mstart,
             o_orderdate + INTERVAL 5 DAY AS plus5,
             o_orderdate - INTERVAL 3 MONTH AS minus3m,
             CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS ld,
             date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS dd,
             CAST(epoch(o_orderdate) AS BIGINT) AS ep,
             make_time(o_orderkey % 24, o_orderkey % 60,
                       CAST(o_orderkey % 60 AS DOUBLE)) AS tm,
             CAST(hour(make_time(o_orderkey % 24, 0, 0.0)) AS INTEGER) AS t_hr,
             CAST(make_time(o_orderkey % 24, o_orderkey % 60, 0.0)
                  AS VARCHAR) AS t_str,
             make_time(o_orderkey % 24, 0, 0.0) < TIME '12:00:00' AS t_am
      FROM orders WHERE o_orderkey < 200
    ) d ON c.o_orderkey = d.o_orderkey
    ORDER BY c.o_orderkey
    """,
)
def func_cast_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`func_cast` + `func_datetime` column-wise on their shared
    orders slice (syntax-test.fsql:404-447)."""
    return (
        func_cast(spark, sf_dir)
        .join(func_datetime(spark, sf_dir), "o_orderkey")
        .orderBy("o_orderkey")
    )


@register(
    "func_json_regex",
    # the JSON battery (events, event_id < 100) and the regex battery
    # (documents, doc_id < 100) share the 0..99 key range — joined
    # column-wise on that id so one driver entry proves both
    oracle="""
    SELECT j.event_id,
           j.k_str, j.k_int, j.missing_path, j.is_valid, j.arr_len,
           j.ij_obj, j.ij_arr, j.ij_scl,
           r.vowels_masked, r.first_word, r.has_data, r.lang_cap
    FROM (
      SELECT event_id,
             json_extract_string(props, '$.k') AS k_str,
             CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
             json_extract_string(props, '$.missing') AS missing_path,
             json_valid(props) AS is_valid,
             json_array_length('[1,2,3]') AS arr_len,
             CASE WHEN json_valid(props) THEN json_type(props) = 'OBJECT'
                  ELSE false END AS ij_obj,
             CASE WHEN json_valid(props) THEN json_type(props) = 'ARRAY'
                  ELSE false END AS ij_arr,
             json_valid(CASE WHEN event_id % 3 = 0 THEN '123'
                             WHEN event_id % 3 = 1 THEN '"s"'
                             ELSE '[1]' END)
             AND json_type(CASE WHEN event_id % 3 = 0 THEN '123'
                                WHEN event_id % 3 = 1 THEN '"s"'
                                ELSE '[1]' END)
                 NOT IN ('OBJECT', 'ARRAY') AS ij_scl
      FROM events WHERE event_id < 100
    ) j JOIN (
      SELECT doc_id,
             regexp_replace(left(text, 60), '[aeiou]', '*', 'g') AS vowels_masked,
             regexp_extract(left(text, 60), '([a-z]+)', 1) AS first_word,
             regexp_matches(text, 'data') AS has_data,
             regexp_replace(lang, '^(e)', 'E', '') AS lang_cap
      FROM documents WHERE doc_id < 100
    ) r ON j.event_id = r.doc_id
    ORDER BY j.event_id
    """,
)
def func_json_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`func_json` + `func_regex` column-wise on the shared 0..99 id
    range (syntax-test.fsql:358-372)."""
    j = func_json(spark, sf_dir)
    r = func_regex(spark, sf_dir)
    return (
        j.join(r, j.event_id == r.doc_id)
        .drop("doc_id")
        .orderBy("event_id")
    )
