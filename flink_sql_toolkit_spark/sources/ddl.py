"""``CREATE TABLE ... WITH ('connector'=..., ...)`` DDL parser.

Parses the Flink table-DDL surface the corpus exercises
(test/syntax-test.fsql:11-63, 626-720): physical columns, computed
columns (``ts AS PROCTIME()``), metadata columns (``... METADATA
[FROM 'key'] [VIRTUAL]``), ``WATERMARK FOR col AS col - INTERVAL
'n' UNIT``, ``PRIMARY KEY (...) NOT ENFORCED``, ``PARTITIONED BY``,
and the WITH-options map. Produces a ``ConnectorTable`` the
connector registry (connectors.py) turns into Spark readers/writers.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from flink_sql_toolkit_spark.compat import SUPPORTS_TIME_TYPE


def _time_type(m: re.Match) -> str:
    # Spark 4.1+ has a native TimeType (behind spark.sql.timeType.
    # enabled, which the engine sets on every session); older builds
    # fall back to the ISO wall-clock string. Flink TIME defaults to
    # second precision (TIME = TIME(0)); Spark's default is time(6).
    if SUPPORTS_TIME_TYPE:
        # Flink allows TIME(0..9); Spark's TimeType caps at micros (6)
        p = int(m.group(1)[1:-1]) if m.group(1) else 0
        return f"time({min(p, 6)})"
    return "string"


_TYPE_MAP = [
    (re.compile(r"(?i)^TIMESTAMP_LTZ(\(\d+\))?$"), "timestamp"),
    (re.compile(r"(?i)^TIMESTAMP(\(\d+\))?$"), "timestamp_ntz"),
    (re.compile(r"(?i)^(DEC|NUMERIC)(\(.*\))?$"), lambda m: "decimal" + (m.group(2) or "")),
    (re.compile(r"(?i)^(CHARACTER|CHAR|VARCHAR)(\(\d+\))?$"), "string"),
    (re.compile(r"(?i)^BYTES$"), "binary"),
    (re.compile(r"(?i)^VARBINARY(\(\d+\))?$"), "binary"),
    (re.compile(r"(?i)^RAW$"), "binary"),
    (re.compile(r"(?i)^TIME(\(\d+\))?$"), _time_type),
    (re.compile(r"(?i)^INTEGER$"), "int"),
    (re.compile(r"(?i)^MULTISET<(.*)>$"), lambda m: f"map<{flink_type_to_spark(m.group(1))}, int>"),
    (re.compile(r"(?i)^ROW<(.*)>$"), lambda m: f"struct<{_row_fields_to_spark(m.group(1))}>"),
]


def _row_fields_to_spark(fields: str) -> str:
    """ROW<name TYPE, ...> field list → struct<name: sparktype, ...>
    (field types recurse through flink_type_to_spark so CTAS-emitted
    ROW<ts TIMESTAMP_LTZ(6)> round-trips to a valid Spark schema).
    Splitting is _split_top's: nested <>/() AND quoted literals (an
    inline field description containing a comma) stay intact."""
    out = []
    for f in _split_top(fields):
        m = re.match(r"(?s)^([\w`]+)\s+(.+)$", f.strip())
        if m:
            out.append(f"{m.group(1).strip('`')}: {flink_type_to_spark(m.group(2))}")
        else:  # unnamed field type (Flink allows ROW<INT, STRING>)
            out.append(flink_type_to_spark(f))
    return ", ".join(out)


def flink_type_to_spark(t: str) -> str:
    t = t.strip()
    for pat, rep in _TYPE_MAP:
        m = pat.match(t)
        if m:
            return rep(m) if callable(rep) else rep
    # recurse into ARRAY<>/MAP<> element types
    m = re.match(r"(?i)^ARRAY\s*<(.*)>$", t)
    if m:
        return f"array<{flink_type_to_spark(m.group(1))}>"
    m = re.match(r"(?is)^MAP\s*<(.*)>$", t)
    if m:
        kv = _split_top(m.group(1))
        if len(kv) == 2:  # top-level split: nested maps stay whole
            return f"map<{flink_type_to_spark(kv[0])}, {flink_type_to_spark(kv[1])}>"
    return t.lower()


def spark_type_to_flink(dt) -> str:
    """Spark DataType → the Flink DDL type name whose
    ``flink_type_to_spark`` round-trips to the same Spark type —
    used by CTAS to synthesize the created table's DDL from the
    query's schema (Flink 1.16 CREATE TABLE … AS semantics)."""
    from pyspark.sql import types as T  # noqa: PLC0415

    if isinstance(dt, T.TimestampType):
        return "TIMESTAMP_LTZ(6)"
    if isinstance(dt, T.TimestampNTZType):
        return "TIMESTAMP(6)"
    if isinstance(dt, T.BinaryType):
        return "BYTES"
    if isinstance(dt, T.ArrayType):
        return f"ARRAY<{spark_type_to_flink(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return (
            f"MAP<{spark_type_to_flink(dt.keyType)}, "
            f"{spark_type_to_flink(dt.valueType)}>"
        )
    if isinstance(dt, T.StructType):
        inner = ", ".join(
            f"{f.name} {spark_type_to_flink(f.dataType)}" for f in dt.fields
        )
        return f"ROW<{inner}>"
    # bigint/int/double/boolean/string/date/decimal(p,s)/time(p) all
    # pass through flink_type_to_spark's fallback (or TIME map) intact
    return dt.simpleString().upper()


@dataclass
class Column:
    name: str
    spark_type: str
    nullable: bool = True
    comment: str | None = None


@dataclass
class ComputedColumn:
    name: str
    expr: str


@dataclass
class MetadataColumn:
    name: str
    spark_type: str
    key: str  # source metadata key, e.g. 'timestamp', 'partition'
    virtual: bool = False


@dataclass
class Watermark:
    column: str
    delay_expr: str  # original '<col> - INTERVAL ...' expression
    delay: str  # Spark duration string, e.g. '5 seconds'


@dataclass
class ConnectorTable:
    name: str
    columns: list[Column] = field(default_factory=list)
    computed: list[ComputedColumn] = field(default_factory=list)
    metadata: list[MetadataColumn] = field(default_factory=list)
    watermark: Watermark | None = None
    primary_key: list[str] = field(default_factory=list)
    partitioned_by: list[str] = field(default_factory=list)
    # FLIP-376 bucketing: DISTRIBUTED BY [HASH|RANGE] (cols) INTO n
    # BUCKETS — the filesystem sink repartitions on the bucket key so
    # one output file region = one bucket (co-located equi-join reads)
    distributed_by: list[str] = field(default_factory=list)
    bucket_algorithm: str = "HASH"
    bucket_count: int | None = None
    options: dict[str, str] = field(default_factory=dict)
    temporary: bool = False
    if_not_exists: bool = False
    comment: str | None = None

    @property
    def connector(self) -> str:
        return self.options.get("connector", "")

    @property
    def format(self) -> str:
        return self.options.get("format", self.options.get("value.format", "json"))

    def schema_ddl(self) -> str:
        return ", ".join(
            f"{c.name} {c.spark_type}" + ("" if c.nullable else " NOT NULL")
            for c in self.columns
        )


_CREATE_RE = re.compile(
    # clause order per Flink: COMMENT, DISTRIBUTED (FLIP-376, 1.20),
    # PARTITIONED BY, WITH
    r"(?is)^\s*CREATE\s+(?P<tmp>TEMPORARY\s+)?TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>[\w.`]+)\s*\((?P<body>.*?)\)\s*(?:COMMENT\s+'(?P<comment>[^']*)'\s*)?"
    r"(?:DISTRIBUTED(?:\s+BY\s+(?P<balgo>HASH|RANGE)?\s*\((?P<bcols>[^)]*)\))?"
    r"(?:\s+INTO\s+(?P<bnum>\d+)\s+BUCKETS)?\s+)?"
    r"(?:PARTITIONED\s+BY\s*\((?P<parts>[^)]*)\)\s*)?"
    r"WITH\s*\((?P<opts>.*?)\)\s*;?\s*$"
)

_INTERVAL_RE = re.compile(r"(?is)INTERVAL\s+'([\d.]+)'\s+(\w+)")

_UNITS = {
    "MILLISECOND": "milliseconds",
    "SECOND": "seconds",
    "MINUTE": "minutes",
    "HOUR": "hours",
    "DAY": "days",
}


def _split_top(text: str, sep: str = ",") -> list[str]:
    parts, depth, start, i, n = [], 0, 0, 0, len(text)
    in_str = False
    while i < n:
        ch = text[i]
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch in "(<[":
            depth += 1
        elif ch in ")>]":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(text[start:i].strip())
            start = i + 1
        i += 1
    tail = text[start:].strip()
    if tail:
        parts.append(tail)
    return parts


def matches_create_table_with(sql: str) -> bool:
    return bool(_CREATE_RE.match(sql))


def parse_watermark(column: str, expr: str) -> Watermark:
    """``WATERMARK FOR col AS <expr>`` → Watermark (the same mapping
    parse_create_table applies: INTERVAL delay → Spark duration;
    SOURCE_WATERMARK()/strictly-ascending → 0 delay)."""
    expr = expr.strip()
    im = _INTERVAL_RE.search(expr)
    delay = "0 seconds"
    if im:
        u = im.group(2).upper()
        unit = _UNITS.get(u.rstrip("S") if u.endswith("S") else u) or _UNITS.get(u, "seconds")
        delay = f"{im.group(1)} {unit}"
    return Watermark(column.strip("`"), expr, delay)


def _rt_type(spark_type: str) -> str:
    """Spark type string → the Flink DDL spelling flink_type_to_spark
    maps BACK to the same Spark type (property-tested fixed point):
    bare ``timestamp`` must re-emerge as TIMESTAMP_LTZ — uppercased
    ``TIMESTAMP`` would re-parse as the NTZ type — including inside
    nested array/map/struct types. Structural, not textual (ADVICE
    r9: a blanket .upper() mangled struct FIELD names, breaking the
    LIKE/reparse round-trip for mixed-case fields): struct<> becomes
    Flink ``ROW<name TYPE, …>`` with field names verbatim."""
    t = spark_type.strip()
    m = re.match(r"(?is)^array\s*<(.*)>$", t)
    if m:
        return f"ARRAY<{_rt_type(m.group(1))}>"
    m = re.match(r"(?is)^map\s*<(.*)>$", t)
    if m:
        kv = _split_top(m.group(1))
        if len(kv) == 2:
            return f"MAP<{_rt_type(kv[0])}, {_rt_type(kv[1])}>"
    m = re.match(r"(?is)^struct\s*<(.*)>$", t)
    if m:
        fields = []
        for f in _split_top(m.group(1)):
            name, _, ftype = f.partition(":")
            fields.append(f"{name.strip()} {_rt_type(ftype)}")
        return f"ROW<{', '.join(fields)}>"
    if re.match(r"(?i)^timestamp$", t):
        return "TIMESTAMP_LTZ"
    return t.upper()


_OPTION_PAIR_RE = re.compile(r"(?s)'((?:[^']|'')*)'\s*=\s*'((?:[^']|'')*)'")


def parse_option_pairs(text: str) -> dict[str, str]:
    """``'k'='v', …`` → dict with '' unescaped in key AND value — the
    single parse-side counterpart of escape_sql_quotes (review r10
    pass 6: three copies of the pattern had already drifted once)."""
    return {
        k.replace("''", "'"): v.replace("''", "'")
        for k, v in _OPTION_PAIR_RE.findall(text)
    }


def escape_sql_quotes(value) -> str:
    """'' escaping for embedding a value in a single-quoted SQL
    literal — THE quoting rule for option values; shared so a future
    escaping change cannot silently miss a site (review r10)."""
    return str(value).replace("'", "''")


def synthesize_ddl(table: "ConnectorTable") -> str:
    """Rebuild the CREATE TABLE text from a (possibly ALTERed)
    ConnectorTable so SHOW CREATE TABLE stays truthful after
    ALTER TABLE ADD/MODIFY/DROP/RENAME mutations."""
    parts: list[str] = []
    for c in table.columns:
        p = f"{c.name} {_rt_type(c.spark_type)}"
        if not c.nullable:
            p += " NOT NULL"
        if c.comment:
            p += f" COMMENT '{c.comment}'"
        parts.append(p)
    for mc in table.metadata:
        p = f"{mc.name} {_rt_type(mc.spark_type)} METADATA"
        if mc.key != mc.name:
            p += f" FROM '{mc.key}'"
        if mc.virtual:
            p += " VIRTUAL"
        parts.append(p)
    parts += [f"{cc.name} AS {cc.expr}" for cc in table.computed]
    if table.watermark:
        parts.append(f"WATERMARK FOR {table.watermark.column} AS {table.watermark.delay_expr}")
    if table.primary_key:
        parts.append(f"PRIMARY KEY ({', '.join(table.primary_key)}) NOT ENFORCED")
    ddl = f"CREATE {'TEMPORARY ' if table.temporary else ''}TABLE {table.name} ({', '.join(parts)})"
    if table.comment:
        ddl += f" COMMENT '{table.comment}'"
    if table.distributed_by or table.bucket_count is not None:
        ddl += " DISTRIBUTED"
        if table.distributed_by:
            ddl += f" BY {table.bucket_algorithm}({', '.join(table.distributed_by)})"
        if table.bucket_count is not None:
            ddl += f" INTO {table.bucket_count} BUCKETS"
    if table.partitioned_by:
        ddl += f" PARTITIONED BY ({', '.join(table.partitioned_by)})"
    # single quotes in values escape as '' — the parser unescapes them
    opts = ", ".join(
        f"'{escape_sql_quotes(k)}'='{escape_sql_quotes(v)}'"
        for k, v in table.options.items()
    )
    return f"{ddl} WITH ({opts})"


def parse_create_table(sql: str) -> ConnectorTable:
    m = _CREATE_RE.match(sql)
    if not m:
        raise ValueError("not a CREATE TABLE ... WITH(...) statement")
    table = ConnectorTable(
        name=m.group("name").strip("`"),
        temporary=bool(m.group("tmp")),
        if_not_exists=bool(m.group("ine")),
        comment=m.group("comment"),
    )
    if m.group("parts"):
        table.partitioned_by = [c.strip().strip("`") for c in m.group("parts").split(",")]
    if m.group("bcols") is not None or m.group("bnum") is not None:
        # DISTRIBUTED BY [HASH|RANGE] (cols) [INTO n BUCKETS] /
        # DISTRIBUTED INTO n BUCKETS (FLIP-376; connector picks the
        # key/algorithm when omitted — here hash on all-columns-absent
        # means round-robin into n output buckets)
        table.distributed_by = [
            c.strip().strip("`") for c in (m.group("bcols") or "").split(",") if c.strip()
        ]
        table.bucket_algorithm = (m.group("balgo") or "HASH").upper()
        table.bucket_count = int(m.group("bnum")) if m.group("bnum") else None
    table.options.update(parse_option_pairs(m.group("opts")))

    # comments strip BEFORE the split: a comma/quote/paren inside an
    # inline comment would otherwise corrupt the item boundaries
    # (review r9: "-- legacy, deprecated" split mid-comment; an
    # apostrophe in a comment swallowed the following WATERMARK)
    for part in _split_top(_strip_comments(m.group("body"))):
        apply_body_part(table, part)
    # reject case-duplicate declarations up front: Spark's
    # case-insensitive resolver cannot serve them (AMBIGUOUS_REFERENCE
    # at first read), and the engine's own column resolution is
    # case-insensitive to match — a typed error here beats a
    # quarantined table (review r10 pass 6)
    _reject_case_duplicate_columns(table)
    return table


def _reject_case_duplicate_columns(table: ConnectorTable) -> None:
    """Typed error on case-insensitively colliding column names across
    physical/computed/metadata columns — tables that Spark would
    quarantine with AMBIGUOUS_REFERENCE at first read. Run on every
    path that assembles a column set (plain CREATE, LIKE merge)."""
    seen: dict[str, str] = {}
    for c in [*table.columns, *table.computed, *table.metadata]:
        prev = seen.get(c.name.lower())
        if prev is not None:
            raise ValueError(
                f"duplicate column name '{c.name}' in table "
                f"'{table.name}' (Spark resolves identifiers "
                f"case-insensitively — collides with '{prev}')"
            )
        seen[c.name.lower()] = c.name


def _strip_comments(text: str) -> str:
    """Remove ``--`` line and ``/* */`` block comments outside string
    literals — corpus DDL carries inline comments inside the column
    list (syntax-test.fsql:19), which previously made the WATERMARK
    item silently unparseable."""
    out: list[str] = []
    i, n, in_str = 0, len(text), False
    while i < n:
        ch = text[i]
        if in_str:
            out.append(ch)
            if ch == "'":
                in_str = False
            i += 1
        elif ch == "'":
            in_str = True
            out.append(ch)
            i += 1
        elif ch == "-" and text[i + 1 : i + 2] == "-":
            j = text.find("\n", i)
            i = n if j < 0 else j
        elif ch == "/" and text[i + 1 : i + 2] == "*":
            j = text.find("*/", i + 2)
            i = n if j < 0 else j + 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def apply_body_part(table: ConnectorTable, part: str) -> str:
    """Parse ONE CREATE-TABLE body item — watermark / primary key /
    metadata column / computed column / physical column — onto
    ``table``; returns which kind was applied (an item that is pure
    comment is a no-op ``"comment"``). Shared by parse_create_table
    and ALTER TABLE ADD (FLIP-273 lets ADD carry the same item kinds
    the CREATE body does)."""
    part = _strip_comments(part).strip()
    if not part:
        return "comment"
    wm = re.match(r"(?is)^WATERMARK\s+FOR\s+([\w`]+)\s+AS\s+(.*)$", part)
    if wm:
        # SOURCE_WATERMARK() (connector-provided watermark,
        # syntaxes/flink.tmLanguage.json:467) and a bare
        # strictly-ascending `AS col` both map to a zero-delay
        # Spark watermark — Spark has no connector-watermark
        # channel, and 0-delay is the tightest sound bound.
        table.watermark = parse_watermark(wm.group(1), wm.group(2))
        return "watermark"
    pm = re.match(r"(?is)^(?:CONSTRAINT\s+\w+\s+)?PRIMARY\s+KEY\s*\(([^)]*)\)", part)
    if pm:
        table.primary_key = [c.strip().strip("`") for c in pm.group(1).split(",")]
        return "primary_key"
    mm = re.match(
        r"(?is)^([\w`]+)\s+(.+?)\s+METADATA(?:\s+FROM\s+'([^']*)')?(\s+VIRTUAL)?$",
        part,
    )
    if mm:
        name = mm.group(1).strip("`")
        table.metadata.append(
            MetadataColumn(
                name=name,
                spark_type=flink_type_to_spark(mm.group(2)),
                key=mm.group(3) or name,
                virtual=bool(mm.group(4)),
            )
        )
        return "metadata"
    cm = re.match(r"(?is)^([\w`]+)\s+AS\s+(.*)$", part)
    if cm and not re.match(r"(?is)^[\w`]+\s+(ARRAY|MAP|ROW|MULTISET)\s*<", part):
        table.computed.append(ComputedColumn(cm.group(1).strip("`"), cm.group(2)))
        return "computed"
    fm = re.match(
        r"(?is)^([\w`]+)\s+(.+?)(\s+NOT\s+NULL)?(\s+COMMENT\s+'([^']*)')?$", part
    )
    if fm:
        table.columns.append(
            Column(
                name=fm.group(1).strip("`"),
                spark_type=flink_type_to_spark(fm.group(2)),
                nullable=not fm.group(3),
                comment=fm.group(5),
            )
        )
        return "column"
    raise ValueError(f"cannot parse table body item: {part!r}")


# -- CREATE TABLE ... LIKE (Flink merge semantics) ---------------------

_CREATE_LIKE_RE = re.compile(
    # body is NON-greedy: a greedy .* swallows ") WITH ('k'='v'" into
    # the column list and silently drops the options (caught in smoke)
    # clause order mirrors _CREATE_RE: COMMENT, DISTRIBUTED (FLIP-376),
    # PARTITIONED BY, WITH (ADVICE r9: a Flink-valid PARTITIONED BY on
    # the new table matched neither regex and fell through to an
    # opaque Spark parse error)
    r"(?is)^\s*CREATE\s+(?P<tmp>TEMPORARY\s+)?TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>[\w.`]+)\s*(?:\((?P<body>.*?)\)\s*)?"
    r"(?:COMMENT\s+'(?P<comment>[^']*)'\s*)?"
    r"(?P<dist>DISTRIBUTED(?:\s+BY\s+(?:HASH|RANGE)?\s*\([^)]*\))?"
    r"(?:\s+INTO\s+\d+\s+BUCKETS)?\s+)?"
    r"(?:PARTITIONED\s+BY\s*\((?P<parts>[^)]*)\)\s*)?"
    r"(?:WITH\s*\((?P<opts>.*?)\)\s*)?"
    r"LIKE\s+(?P<src>[\w.`]+)\s*(?:\(\s*(?P<feats>(?:INCLUDING|EXCLUDING|OVERWRITING)[^)]*)\))?\s*;?\s*$"
)

_LIKE_FEAT_RE = re.compile(
    r"(?is)\b(INCLUDING|EXCLUDING|OVERWRITING)\s+"
    r"(ALL|CONSTRAINTS|PARTITIONS|DISTRIBUTION|GENERATED|METADATA|OPTIONS|WATERMARKS)\b"
)

_LIKE_CATEGORIES = (
    "CONSTRAINTS", "PARTITIONS", "DISTRIBUTION",
    "GENERATED", "METADATA", "OPTIONS", "WATERMARKS",
)


def matches_create_table_like(sql: str) -> "re.Match | None":
    return _CREATE_LIKE_RE.match(sql)


def merge_like_table(sql: str, src: ConnectorTable) -> ConnectorTable:
    """Flink ``CREATE TABLE new [({extras})] [WITH (opts)] LIKE src
    [(like_options)]`` — build the merged ConnectorTable.

    Merge rules (Flink table DDL docs): with NO like options the
    default strategy is ``INCLUDING ALL OVERWRITING OPTIONS`` — the
    canonical "same table, different topic/startup-mode" pattern just
    works, the new WITH winning on duplicate keys. With explicit like
    options the base is INCLUDING for every category; per-category
    overrides are {INCLUDING|EXCLUDING} for CONSTRAINTS/PARTITIONS/
    DISTRIBUTION and {INCLUDING|EXCLUDING|OVERWRITING} for GENERATED/
    METADATA/OPTIONS/WATERMARKS. Physical columns always copy; a
    redefined physical column is an error. Under INCLUDING (not
    OVERWRITING) OPTIONS, a duplicate key with a different value is
    an error.
    """
    import copy as _copy  # noqa: PLC0415

    m = _CREATE_LIKE_RE.match(sql)
    if not m:
        raise ValueError("not a CREATE TABLE ... LIKE statement")
    # parse the new table's own clauses by reusing the plain parser on
    # a synthesized statement (empty WITH allowed)
    dist = m.group("dist") or ""
    parts = f"PARTITIONED BY ({m.group('parts')}) " if m.group("parts") else ""
    new = parse_create_table(
        f"CREATE TABLE {m.group('name')} ({m.group('body') or ''}) "
        f"{dist}{parts}WITH ({m.group('opts') or ''});"
    )
    new.temporary = bool(m.group("tmp"))
    new.if_not_exists = bool(m.group("ine"))
    new.comment = m.group("comment")

    mode = dict.fromkeys(_LIKE_CATEGORIES, "INCLUDING")
    if not (m.group("feats") or "").strip():
        mode["OPTIONS"] = "OVERWRITING"  # Flink's no-options default
    for verb, cat in _LIKE_FEAT_RE.findall(m.group("feats") or ""):
        verb, cat = verb.upper(), cat.upper()
        if cat == "ALL":
            if verb == "OVERWRITING":
                raise ValueError("OVERWRITING ALL is not a valid LIKE option")
            mode = dict.fromkeys(_LIKE_CATEGORIES, verb)
        else:
            if verb == "OVERWRITING" and cat in ("CONSTRAINTS", "PARTITIONS", "DISTRIBUTION"):
                raise ValueError(f"OVERWRITING {cat} is not a valid LIKE option")
            mode[cat] = verb

    out = _copy.deepcopy(new)
    # physical columns: source first, new appended; duplicates error.
    # Membership is case-insensitive throughout the merge — the engine
    # resolves identifiers case-insensitively, so `A` redefines `a`
    # (ADVICE r10: case-sensitive sets here merged both, producing the
    # AMBIGUOUS_REFERENCE table parse_create_table's validation exists
    # to prevent)
    src_names = {c.name.lower() for c in src.columns}
    for c in new.columns:
        if c.name.lower() in src_names:
            raise ValueError(
                f"LIKE: column '{c.name}' is already defined by source "
                f"table '{src.name}'"
            )
    out.columns = _copy.deepcopy(src.columns) + new.columns

    def pick(cat: str, src_val, new_val, empty):
        has_new = new_val != empty
        if mode[cat] == "EXCLUDING":
            return new_val
        if has_new:
            if mode[cat] == "OVERWRITING" or src_val == empty:
                return new_val
            # OVERWRITING is not valid for CONSTRAINTS/PARTITIONS —
            # point at EXCLUDING there, matching Flink's guidance
            verb = "EXCLUDING" if cat in ("CONSTRAINTS", "PARTITIONS") else "OVERWRITING"
            raise ValueError(
                f"LIKE: {cat.lower()} already defined by source table — "
                f"use {verb} {cat} to redefine"
            )
        return _copy.deepcopy(src_val)

    out.primary_key = pick("CONSTRAINTS", src.primary_key, new.primary_key, [])
    out.partitioned_by = pick("PARTITIONS", src.partitioned_by, new.partitioned_by, [])
    out.watermark = pick("WATERMARKS", src.watermark, new.watermark, None)
    if mode["DISTRIBUTION"] == "INCLUDING":
        if new.distributed_by or new.bucket_count is not None:
            if src.distributed_by or src.bucket_count is not None:
                raise ValueError(
                    "LIKE: distribution already defined by source table"
                )
        else:
            out.distributed_by = list(src.distributed_by)
            out.bucket_algorithm = src.bucket_algorithm
            out.bucket_count = src.bucket_count
    if mode["GENERATED"] != "EXCLUDING":
        new_gen = {c.name.lower() for c in new.computed}
        inherited = [
            _copy.deepcopy(c) for c in src.computed if c.name.lower() not in new_gen
        ]
        dup = [c.name for c in src.computed if c.name.lower() in new_gen]
        if dup and mode["GENERATED"] != "OVERWRITING":
            raise ValueError(
                f"LIKE: computed column(s) {dup} already defined by source "
                f"table — use OVERWRITING GENERATED"
            )
        out.computed = inherited + new.computed
    if mode["METADATA"] != "EXCLUDING":
        new_md = {c.name.lower() for c in new.metadata}
        inherited_md = [
            _copy.deepcopy(c) for c in src.metadata if c.name.lower() not in new_md
        ]
        dup = [c.name for c in src.metadata if c.name.lower() in new_md]
        if dup and mode["METADATA"] != "OVERWRITING":
            raise ValueError(
                f"LIKE: metadata column(s) {dup} already defined by source "
                f"table — use OVERWRITING METADATA"
            )
        out.metadata = inherited_md + new.metadata
    if mode["OPTIONS"] != "EXCLUDING":
        merged = dict(src.options)
        for k, v in new.options.items():
            if k in merged and merged[k] != v and mode["OPTIONS"] != "OVERWRITING":
                raise ValueError(
                    f"LIKE: option '{k}' already set to '{merged[k]}' by the "
                    f"source table — use OVERWRITING OPTIONS to change it"
                )
            merged[k] = v
        out.options = merged
    # the merged column set crosses categories the per-category checks
    # above can't see (e.g. a new physical column vs an inherited
    # computed one) — run the same case-insensitive validation plain
    # CREATE gets (ADVICE r10)
    _reject_case_duplicate_columns(out)
    return out
