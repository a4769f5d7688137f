"""Flink scalar-function shims (SURVEY.md §2.10).

Most Flink built-ins exist in Spark under the same name. The
remainder are registered per-session as **SQL UDFs** (Spark 4
``CREATE TEMPORARY FUNCTION ... RETURN <expr>``): they inline into
the plan as Catalyst expressions — codegen'd, no Python in the hot
path, safe at any scale. Python UDFs are used only where an
expression cannot express the semantics (GCD/LCM loops).

Reference citations: split/hash/string functions
test/syntax-test.fsql:351-374; math :377-401; datetime :404-429;
tmLanguage.json:431-467.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name → (args, return type, body expression)
_SQL_SHIMS: dict[str, tuple[str, str, str]] = {
    # string
    "SPLIT_INDEX": (
        "(s STRING, sep STRING, i INT)",
        "STRING",
        "element_at(split(s, concat('\\\\Q', sep, '\\\\E')), i + 1)",
    ),
    "SIMILARITY": (
        "(a STRING, b STRING)",
        "DOUBLE",
        "1.0 - CAST(levenshtein(a, b) AS DOUBLE) / greatest(length(a), length(b), 1)",
    ),
    "SHA224": ("(s STRING)", "STRING", "sha2(s, 224)"),
    "SHA384": ("(s STRING)", "STRING", "sha2(s, 384)"),
    "SHA512": ("(s STRING)", "STRING", "sha2(s, 512)"),
    "FROM_BASE64": ("(s STRING)", "STRING", "decode(unbase64(s), 'UTF-8')"),
    "SHA256": ("(s STRING)", "STRING", "sha2(s, 256)"),
    "CONVERT_TZ": (
        "(ts STRING, tz_from STRING, tz_to STRING)",
        "STRING",
        "date_format(convert_timezone(tz_from, tz_to, CAST(ts AS TIMESTAMP_NTZ)), 'yyyy-MM-dd HH:mm:ss')",
    ),
    "TO_BASE64": ("(s STRING)", "STRING", "base64(CAST(s AS BINARY))"),
    "HASH_CODE": ("(s STRING)", "INT", "hash(s)"),
    "MURMUR_HASH": ("(s STRING)", "INT", "hash(s)"),
    "MURMUR_HASH_64": ("(s STRING)", "BIGINT", "xxhash64(s)"),
    "XXH3_64": ("(s STRING)", "BIGINT", "xxhash64(s)"),
    # math — COT/LOG2/CBRT/FACTORIAL/WIDTH_BUCKET/PI/E are Spark
    # builtins already (as are TIME_TRUNC and abbreviated
    # DAYNAME/MONTHNAME; Flink's full-name DAYNAME is a dialect
    # rewrite since builtins cannot be shadowed by SQL UDFs)
    "RAND_INTEGER": ("(bound INT)", "INT", "CAST(floor(rand() * bound) AS INT)"),
    # bitwise named functions (tmLanguage.json math battery; Flink
    # accepts any integer type — BIGINT is the widest common type,
    # narrower ints widen losslessly on the way in)
    "BITAND": ("(a BIGINT, b BIGINT)", "BIGINT", "a & b"),
    "BITOR": ("(a BIGINT, b BIGINT)", "BIGINT", "a | b"),
    "BITXOR": ("(a BIGINT, b BIGINT)", "BIGINT", "a ^ b"),
    "BITNOT": ("(a BIGINT)", "BIGINT", "~a"),
    "BIT_LSHIFT": ("(a BIGINT, n INT)", "BIGINT", "shiftleft(a, n)"),
    "BIT_RSHIFT": ("(a BIGINT, n INT)", "BIGINT", "shiftright(a, n)"),
    "TRUNCATE": (
        "(x DOUBLE, d INT)",
        "DOUBLE",
        "CAST(CAST(x * pow(10, d) AS BIGINT) AS DOUBLE) / pow(10, d)",
    ),
    # datetime
    "IS_LEAP_YEAR": (
        "(d DATE)",
        "BOOLEAN",
        "(year(d) % 4 = 0 AND year(d) % 100 <> 0) OR year(d) % 400 = 0",
    ),
    "CURRENT_ROW_TIMESTAMP": ("()", "TIMESTAMP", "current_timestamp()"),
    # JSON (Flink SQL/JSON → Spark JSON path functions)
    "JSON_VALUE": ("(j STRING, p STRING)", "STRING", "get_json_object(j, p)"),
    # JSON_QUERY returns the matched JSON *fragment* (object/array)
    # as text — get_json_object does exactly that for non-scalars
    "JSON_QUERY": ("(j STRING, p STRING)", "STRING", "get_json_object(j, p)"),
    "JSON_EXISTS": ("(j STRING, p STRING)", "BOOLEAN", "get_json_object(j, p) IS NOT NULL"),
    "JSON_STRING": ("(j STRING)", "STRING", "to_json(struct(j))"),
    "IS_JSON": ("(j STRING)", "BOOLEAN", "try_parse_json(j) IS NOT NULL"),
    # IS_JSON_<TYPE> family (tmLanguage.json JSON battery):
    # json_array_length / json_object_keys return NULL for anything
    # that is not a valid JSON array / object, so the NULL-ness IS
    # the predicate; SCALAR = valid JSON that is neither
    "IS_JSON_ARRAY": ("(j STRING)", "BOOLEAN", "json_array_length(j) IS NOT NULL"),
    "IS_JSON_OBJECT": ("(j STRING)", "BOOLEAN", "json_object_keys(j) IS NOT NULL"),
    "IS_JSON_SCALAR": (
        "(j STRING)",
        "BOOLEAN",
        "try_parse_json(j) IS NOT NULL AND json_array_length(j) IS NULL "
        "AND json_object_keys(j) IS NULL",
    ),
}


def _gcd(a: int, b: int) -> int:
    import math

    return math.gcd(int(a), int(b))


def _lcm(a: int, b: int) -> int:
    import math

    return abs(int(a) * int(b)) // math.gcd(int(a), int(b)) if a and b else 0


def register_function_shims(spark: SparkSession) -> list[str]:
    """Register all shims on the session; return registered names."""
    registered = []
    # Flink's MAP_UNION (→ map_concat, dialect rewrite) and the map
    # constructor both resolve duplicate keys last-wins; Spark's
    # default is to raise. Runtime-settable, session-scoped.
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    for name, (args, rtype, body) in _SQL_SHIMS.items():
        sql_name = name.rstrip("_")
        try:
            spark.sql(
                f"CREATE OR REPLACE TEMPORARY FUNCTION {sql_name}{args} "
                f"RETURNS {rtype} RETURN {body}"
            )
            registered.append(sql_name)
        except Exception:  # noqa: BLE001 — leave missing shims discoverable
            pass
    # iterative algorithms: Python UDFs (slow path, off the hot loop)
    spark.udf.register("GCD", _gcd, "bigint")
    spark.udf.register("LCM", _lcm, "bigint")
    registered += ["GCD", "LCM"]
    return registered
