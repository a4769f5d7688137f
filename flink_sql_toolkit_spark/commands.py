"""Engine command layer: SHOW / DESCRIBE / USE / SET / EXPLAIN / jobs.

Implements the reference's metadata-and-admin statement surface
(test/syntax-test.fsql:517-560; src/flinkClient.ts:350-500) with
Flink-shaped outputs — notably the six-column DESCRIBE the
reference's webview consumes (src/objectDetailsProvider.ts:122-133)
and SHOW JOBS over the streaming job registry.

Each handler returns ``(columns, rows)`` where columns are
``[{name, logicalType}]`` dicts, matching the result wire format
(src/flinkClient.ts:12-27).
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING, Any

if TYPE_CHECKING:  # pragma: no cover
    from flink_sql_toolkit_spark.engine import EngineSession

Cols = list[dict[str, str]]
Rows = list[list[Any]]


def _c(*names_types: tuple[str, str]) -> Cols:
    return [{"name": n, "logicalType": t} for n, t in names_types]


# SET key translation (SURVEY §2.1): Flink exec conf → Spark conf
_SET_TRANSLATION = {
    "parallelism.default": "spark.sql.shuffle.partitions",
    "table.exec.resource.default-parallelism": "spark.sql.shuffle.partitions",
    "table.optimizer.join-reorder-enabled": "spark.sql.cbo.joinReorder.enabled",
    "table.exec.sort.default-limit": "spark.sql.execution.topKSortFallbackThreshold",
}

# keys kept engine-side and applied where an analogue exists
_ENGINE_KEYS = {
    "execution.runtime-mode",            # streaming|batch → dispatch mode
    "execution.checkpointing.interval",  # → streaming trigger interval
    "table.exec.state.ttl",              # → stateful-operator key TTL (engine.state_ttl_ms)
    "pipeline.name",                     # → job name
    "sql-client.execution.result-mode",
}


def handle_set(session: "EngineSession", stmt: str) -> tuple[Cols, Rows] | None:
    # '' escapes a quote inside key or value, the SQL literal syntax
    # the DDL/ALTER option parsers already honor (review r10)
    m = re.match(
        r"(?is)^SET\s*(?:'((?:[^']|'')+)'\s*=\s*'((?:[^']|'')*)')?\s*;?\s*$", stmt
    )
    if not m:
        return None
    key, val = m.group(1), m.group(2)
    if key is not None:
        key, val = key.replace("''", "'"), val.replace("''", "'")
    cols = _c(("key", "string"), ("value", "string"))
    if key is None:  # bare SET lists the session's conf (Flink behavior)
        return cols, [[k, v] for k, v in sorted(session.flink_conf.items())]
    session.flink_conf[key] = val
    if key in _SET_TRANSLATION:
        session.spark.conf.set(_SET_TRANSLATION[key], val)
    elif key.startswith("spark."):
        session.spark.conf.set(key, val)
    return _c(("result", "string")), [["OK"]]


def handle_reset(session: "EngineSession", stmt: str) -> tuple[Cols, Rows] | None:
    m = re.match(r"(?is)^RESET\s*(?:'((?:[^']|'')+)')?\s*;?\s*$", stmt)
    if not m:
        return None
    key = m.group(1).replace("''", "'") if m.group(1) else None
    if key is None:
        session.flink_conf.clear()
    else:
        session.flink_conf.pop(key, None)
        if key in _SET_TRANSLATION:
            session.spark.conf.unset(_SET_TRANSLATION[key])
        elif key.startswith("spark."):
            session.spark.conf.unset(key)
    return _c(("result", "string")), [["OK"]]


def _like_filter(stmt: str, names: list[str]) -> list[str]:
    """Flink's ``SHOW … [NOT] LIKE 'pattern'`` filter (SQL LIKE
    semantics: % = any run, _ = one char; ILIKE case-insensitive;
    '' unescapes to a literal quote). No LIKE clause → all names
    (previously the filter was silently ignored — the full listing
    came back for SHOW TABLES LIKE 'x%')."""
    m = re.search(r"(?is)\b(NOT\s+)?(I?LIKE)\s+'((?:[^']|'')*)'\s*;?\s*$", stmt)
    if not m:
        return list(names)
    raw = m.group(3).replace("''", "'")
    flags = re.DOTALL | (re.IGNORECASE if m.group(2).upper() == "ILIKE" else 0)
    pat = re.compile(
        "^" + re.escape(raw).replace("%", ".*").replace("_", ".") + "$", flags
    )
    keep = (lambda n: not pat.match(n)) if m.group(1) else (lambda n: bool(pat.match(n)))
    return [n for n in names if keep(n)]


def handle_show(session: "EngineSession", stmt: str) -> tuple[Cols, Rows] | None:
    s = re.sub(r"\s+", " ", stmt.strip().rstrip(";")).upper()
    spark = session.spark

    emu = session.emulated_catalogs
    if s == "SHOW CURRENT CATALOG":
        current = emu.current or spark.catalog.currentCatalog()
        return _c(("current catalog name", "string")), [[current]]
    if s == "SHOW CURRENT DATABASE":
        cat = emu.current_catalog()
        if cat is not None:
            return _c(("current database name", "string")), [
                [emu.current_db or cat.default_database]
            ]
        return _c(("current database name", "string")), [[spark.catalog.currentDatabase()]]
    # listing commands read through the session's TTL metadata cache
    # (src/catalogProvider.ts:349-377) — repeated SHOW calls within
    # the TTL cost no catalog round-trip
    if s.startswith("SHOW CATALOGS"):
        names = sorted(set(session.metadata.catalogs()) | set(emu.catalogs))
        return _c(("catalog name", "string")), [[c] for c in _like_filter(stmt, names)]
    # branch dispatch must not see FROM/IN inside a LIKE pattern
    # literal (review r9: LIKE '%from%' flipped the listing source)
    s_nolit = re.sub(r"'(?:[^']|'')*'", "''", s)
    if s.startswith("SHOW DATABASES"):
        m = re.match(r"(?is)^SHOW\s+DATABASES\s+(?:FROM|IN)\s+([\w`]+)", stmt.strip())
        if m:
            cname = m.group(1).strip("`")
            named = emu.catalogs.get(cname)
            if named is not None:
                names = sorted(named.databases)
            elif cname not in session.metadata.catalogs():
                raise LookupError(f"catalog '{cname}' does not exist")
            else:
                names = session.metadata.databases(cname)
            return _c(("database name", "string")), [[d] for d in _like_filter(stmt, names)]
        cat = emu.current_catalog()
        names = sorted(cat.databases) if cat is not None else session.metadata.databases()
        return _c(("database name", "string")), [[d] for d in _like_filter(stmt, names)]
    if s.startswith("SHOW TABLES"):
        db = emu.current_database()
        if db is not None and not re.search(r"(?i)\b(FROM|IN)\b", s_nolit):
            names = sorted(db.tables)
        else:
            names = session.metadata.tables()
        return _c(("table name", "string")), [[t] for t in _like_filter(stmt, names)]
    if s.startswith("SHOW VIEWS"):
        return _c(("view name", "string")), [
            [v] for v in _like_filter(stmt, session.metadata.views())
        ]
    if s.startswith("SHOW FUNCTIONS"):
        return (
            _c(("function name", "string")),
            [[f] for f in _like_filter(stmt, session.metadata.functions())],
        )
    if s == "SHOW JOBS":
        return (
            _c(("job id", "string"), ("job name", "string"), ("status", "string"), ("start time", "string")),
            [
                [j.job_id, j.name, j.status, j.start_time.isoformat()]
                for j in session.jobs.list()
            ],
        )
    if s.startswith("SHOW MODULES") or s.startswith("SHOW FULL MODULES"):
        cols = _c(("module name", "string"), ("used", "boolean"))
        return cols, [[m, True] for m in session.modules]
    if s == "SHOW JARS":
        rows = [[str(j)] for j in spark.sql("LIST JAR").collect()] if session.jars else []
        return _c(("jars", "string")), [[j] for j in session.jars] or rows
    if s.startswith("SHOW CREATE TABLE") or s.startswith("SHOW CREATE VIEW"):
        name = stmt.strip().rstrip(";").split()[-1].strip("`")
        if name in session.connector_tables:
            return _c(("result", "string")), [[session.connector_ddl.get(name, "")]]
        try:
            df = spark.sql(f"SHOW CREATE TABLE {name}")
            return _c(("result", "string")), [[r[0]] for r in df.collect()]
        except Exception:  # noqa: BLE001 — temp views: synthesize from schema
            fields = spark.sql(f"SELECT * FROM {name} WHERE 1=0").schema.fields
            cols = ",\n  ".join(f"{f.name} {f.dataType.simpleString().upper()}" for f in fields)
            return _c(("result", "string")), [[f"CREATE TEMPORARY VIEW {name} (\n  {cols}\n)"]]
    if s.startswith("SHOW PARTITIONS") or s.startswith("SHOW COLUMNS"):
        df = spark.sql(stmt.rstrip(";"))
        cols = [{"name": f.name, "logicalType": f.dataType.simpleString()} for f in df.schema.fields]
        return cols, [list(r) for r in df.collect()]
    return None


def handle_describe(session: "EngineSession", stmt: str) -> tuple[Cols, Rows] | None:
    m = re.match(r"(?is)^(?:DESCRIBE|DESC)\s+(?!EXTENDED|FORMATTED)([\w.`]+)\s*;?\s*$", stmt.strip())
    if not m:
        return None
    name = m.group(1).strip("`")
    cols = _c(
        ("name", "string"),
        ("type", "string"),
        ("null", "boolean"),
        ("key", "string"),
        ("extras", "string"),
        ("watermark", "string"),
    )

    def fetch() -> Rows:
        rows: Rows = []
        ct = session.connector_tables.get(name)
        if ct is not None:
            pk = set(ct.primary_key)
            wm = f"`{ct.watermark.column}` AS {ct.watermark.delay_expr}" if ct.watermark else None
            for c in ct.columns:
                rows.append(
                    [c.name, c.spark_type.upper(), c.nullable, "PRI(NOT ENFORCED)" if c.name in pk else None, None,
                     wm if ct.watermark and ct.watermark.column == c.name else None]
                )
            for mc in ct.metadata:
                rows.append([mc.name, mc.spark_type.upper(), True, None,
                             f"METADATA FROM '{mc.key}'" + (" VIRTUAL" if mc.virtual else ""), None])
            for cc in ct.computed:
                rows.append([cc.name, "", True, None, f"AS {cc.expr}", None])
            return rows
        for f in session.spark.sql(f"SELECT * FROM {name} WHERE 1=0").schema.fields:
            rows.append([f.name, f.dataType.simpleString().upper(), f.nullable, None, None, None])
        return rows

    return cols, session.metadata.describe_rows(name, fetch)


def handle_use(session: "EngineSession", stmt: str) -> tuple[Cols, Rows] | None:
    emu = session.emulated_catalogs
    m = re.match(r"(?is)^USE\s+CATALOG\s+([\w.`]+)\s*;?\s*$", stmt)
    if m:
        name = m.group(1).strip("`")
        if name in emu.catalogs:
            emu.current, emu.current_db = name, None
            session.metadata.invalidate()
            return _c(("result", "string")), [["OK"]]
        try:
            session.spark.catalog.setCurrentCatalog(name)
        except Exception as e:  # Py4J stack → Flink-style typed error
            raise LookupError(
                f"catalog '{name}' cannot be found — register a Spark "
                f"catalog plugin under spark.sql.catalog.{name}"
            ) from e
        emu.current = emu.current_db = None  # back on a real catalog
        session.metadata.invalidate()  # current-context listings changed
        return _c(("result", "string")), [["OK"]]
    m = re.match(r"(?is)^USE\s+([\w.`]+)\s*;?\s*$", stmt)
    if m:
        name = m.group(1).replace("`", "")
        parts = name.split(".")
        if len(parts) == 2 and parts[0] in emu.catalogs:
            # USE catalog.database — Flink's qualified form
            cat = emu.catalogs[parts[0]]
            if parts[1] not in cat.databases:
                raise LookupError(f"database '{parts[0]}.{parts[1]}' does not exist")
            emu.current, emu.current_db = parts[0], parts[1]
            session.metadata.invalidate()
            return _c(("result", "string")), [["OK"]]
        cat = emu.current_catalog()
        if cat is not None and len(parts) == 1:
            if name not in cat.databases:
                raise LookupError(f"database '{cat.name}.{name}' does not exist")
            emu.current_db = name
            session.metadata.invalidate()
            return _c(("result", "string")), [["OK"]]
        if len(parts) == 2:
            session.spark.sql(f"USE {name}")  # qualified Spark form
        else:
            session.spark.catalog.setCurrentDatabase(name)
        emu.current = emu.current_db = None
        session.metadata.invalidate()
        return _c(("result", "string")), [["OK"]]
    return None


def handle_jobs_admin(session: "EngineSession", stmt: str) -> tuple[Cols, Rows] | None:
    m = re.match(r"(?is)^STOP\s+JOB\s+'([^']+)'(\s+WITH\s+SAVEPOINT)?(\s+WITH\s+DRAIN)?\s*;?\s*$", stmt)
    if m:
        session.jobs.stop(m.group(1))
        # the job's Spark checkpoint directory IS the savepoint
        # (SURVEY §2.1): feed it back through SET
        # 'execution.savepoint.path' to resume the statement from
        # this state (engine INSERT path; Flink stop-with-savepoint →
        # resume contract, test/syntax-test.fsql:559-560). Never fall
        # back to checkpoint_root — it is the shared PARENT of all
        # job checkpoints, not any job's state, and the running-job
        # collision guard cannot protect it (ADVICE r12): a job with
        # no recorded checkpoint gets a typed error under
        # WITH SAVEPOINT and a NULL path otherwise.
        job = session.jobs.get(m.group(1))
        path = job.checkpoint if job else None
        if m.group(2) and job is not None and path is None:
            # a KNOWN job with no recorded checkpoint: typed error, not
            # a directory that is no job's state. An unknown job id
            # stays accept-and-NULL (idempotent cancel, corpus parity:
            # the reference client accepts the statement shape).
            raise RuntimeError(
                f"job '{m.group(1)}' has no resumable savepoint: it was "
                "registered without a checkpoint location (the job is "
                "stopped, but there is no state to resume from)"
            )
        return _c(("savepoint path", "string")), [[path]]
    m = re.match(r"(?is)^(?:DESCRIBE|DESC)\s+JOB\s+'([^']+)'\s*;?\s*$", stmt)
    if m:
        # Flink 1.19 DESCRIBE JOB 'id' — one SHOW JOBS-shaped row
        for j in session.jobs.list():
            if j.job_id == m.group(1):
                return (
                    _c(("job id", "string"), ("job name", "string"),
                       ("status", "string"), ("start time", "string")),
                    [[j.job_id, j.name, j.status, j.start_time.isoformat()]],
                )
        raise LookupError(f"job '{m.group(1)}' does not exist")
    m = re.match(r"(?is)^ADD\s+JAR\s+'([^']+)'\s*;?\s*$", stmt)
    if m:
        session.spark.sql(f"ADD JAR {m.group(1)!r}")
        session.jars.append(m.group(1))
        return _c(("result", "string")), [["OK"]]
    m = re.match(r"(?is)^REMOVE\s+JAR\s+'([^']+)'\s*;?\s*$", stmt)
    if m:
        # Spark cannot unload a jar from a running JVM — warn, record
        if m.group(1) in session.jars:
            session.jars.remove(m.group(1))
        return _c(("result", "string")), [["OK (jar unlinked from registry; JVM classpath unchanged)"]]
    m = re.match(r"(?is)^(LOAD|UNLOAD)\s+MODULE\s+([\w`]+).*?;?\s*$", stmt)
    if m:
        name = m.group(2).strip("`")
        if m.group(1).upper() == "LOAD":
            if name not in session.modules:
                session.modules.append(name)
        elif name in session.modules:
            session.modules.remove(name)
        return _c(("result", "string")), [["OK"]]
    return None


def _refresh_altered(session: "EngineSession", table) -> tuple[Cols, Rows]:
    """Post-ALTER bookkeeping on a connector table: resynthesize the
    stored DDL (SHOW CREATE TABLE stays truthful), re-register the
    reader view, and drop the stale cached schema."""
    from flink_sql_toolkit_spark.sources.ddl import synthesize_ddl  # noqa: PLC0415

    session.connector_ddl[table.name] = synthesize_ddl(table)
    session._register_view(table)
    session.metadata.invalidate_table(table.name)
    return _c(("result", "string")), [["OK"]]


def _find_column(table, col: str):
    # case-insensitive like Spark's resolution (review r10 pass 5:
    # MODIFY TS was falsely rejected while DROP/RENAME resolved it)
    cl = col.lower()
    for c in table.columns:
        if c.name.lower() == cl:
            return c
    raise LookupError(f"column '{col}' does not exist in table '{table.name}'")


def _find_any_column(table, col: str) -> tuple[str, object]:
    """Locate ``col`` across the three column kinds a Flink table
    declares — physical / computed / metadata — case-insensitively
    (Spark's resolution) and return (kind, column object)."""
    cl = col.lower()
    for c in table.computed:
        if c.name.lower() == cl:
            return "computed", c
    for c in table.metadata:
        if c.name.lower() == cl:
            return "metadata", c
    for c in table.columns:
        if c.name.lower() == cl:
            return "physical", c
    raise LookupError(f"column '{col}' does not exist in table '{table.name}'")


# a word match in one of these positions is NOT a column reference:
# the word after AS inside an expression is a cast-target type (no
# aliases occur in computed/watermark exprs), the word after a masked
# INTERVAL literal is a time unit, the first TIMESTAMPADD/DIFF
# argument and the FLOOR/CEIL ... TO operand are units, and
# `<unit> FROM` is EXTRACT's unit slot — all keyword positions a
# column named `date` or `second` must not collide with (review r10
# pass 4 INTERVAL; pass 5 the datetime-function slots)
_NONREF_PREFIX = re.compile(
    r"(?is)(?:\b(?:AS|TO|INTERVAL\s+\x00\d+\x00)\s+"
    r"|\b(?:TIMESTAMPADD|TIMESTAMPDIFF)\s*\(\s*)$"
)

_UNIT_WORDS = frozenset(
    "year quarter month week day hour minute second millisecond "
    "microsecond nanosecond epoch dow doy isodow isoyear".split()
)


def _enclosing_call_is(masked: str, pos: int, fn: str) -> bool:
    """True when the nearest unmatched '(' left of ``pos`` is the
    argument list of ``fn``."""
    depth = 0
    for i in range(pos - 1, -1, -1):
        ch = masked[i]
        if ch == ")":
            depth += 1
        elif ch == "(":
            if depth == 0:
                return bool(
                    re.search(rf"(?is)\b{fn}\s*$", masked[:i])
                )
            depth -= 1
    return False


def _ref_matches(masked: str, col: str) -> list[re.Match]:
    pat = re.compile(rf"(?i)(?<!\w){re.escape(col)}(?!\w)")
    out = []
    for m in pat.finditer(masked):
        if _NONREF_PREFIX.search(masked[: m.start()]):
            continue
        # EXTRACT(SECOND FROM ts): a unit word directly before FROM,
        # INSIDE an EXTRACT call, is the unit slot — the enclosing-call
        # check keeps SUBSTRING(day FROM 2) / TRIM(day FROM s)
        # counting their genuine references to a unit-named column
        # (review r10 pass 6)
        if (
            col.lower() in _UNIT_WORDS
            and re.match(r"(?is)\s+FROM\b", masked[m.end():])
            and _enclosing_call_is(masked, m.start(), "EXTRACT")
        ):
            continue
        out.append(m)
    return out


def _is_quoted_ref(lit: str, col: str) -> bool:
    return lit.startswith("`") and lit.strip("`").lower() == col.lower()


def _expr_references(expr: str, col: str) -> bool:
    """True when ``expr`` references column ``col`` — case-insensitive
    like Spark's resolution, with string literals masked out
    (`concat('k', name)` does not reference k — review r10), keyword
    positions excluded, and backtick-quoted spellings checked in the
    mask's literal table (``_mask`` placeholders them — review r10
    pass 4)."""
    from flink_sql_toolkit_spark.dialect.rewriter import _mask  # noqa: PLC0415

    masked, lits = _mask(expr)
    if _ref_matches(masked, col):
        return True
    return any(_is_quoted_ref(lit, col) for lit in lits)


def _rename_in_expr(expr: str, old: str, new: str) -> str:
    """Rewrite references to ``old`` as ``new`` inside an expression —
    the same reference definition _expr_references uses (literal-safe,
    keyword-position-safe, backtick-aware, case-insensitive)."""
    from flink_sql_toolkit_spark.dialect.rewriter import _mask, _unmask  # noqa: PLC0415

    masked, lits = _mask(expr)
    out, pos = [], 0
    for m in _ref_matches(masked, old):
        out.append(masked[pos : m.start()])
        out.append(new)
        pos = m.end()
    out.append(masked[pos:])
    lits = [f"`{new}`" if _is_quoted_ref(lit, old) else lit for lit in lits]
    return _unmask("".join(out), lits)


def _referencing_exprs(table, col: str, include_watermark: bool = True) -> str | None:
    """Human-readable description of the generated-column / watermark
    expressions that reference ``col``, or None."""
    deps = [
        f"computed column '{c.name}' ({c.name} AS {c.expr})"
        for c in table.computed
        if c.name != col and _expr_references(c.expr, col)
    ]
    if include_watermark and table.watermark and table.watermark.column != col and (
        _expr_references(table.watermark.delay_expr, col)
    ):
        deps.append(f"the WATERMARK expression ({table.watermark.delay_expr})")
    return "; ".join(deps) or None


def handle_alter(session: "EngineSession", stmt: str) -> tuple[Cols, Rows] | None:
    """Flink ``ALTER TABLE`` subforms on connector-registry tables —
    SET / RESET / ADD / MODIFY / DROP / RENAME / COMPACT, the full
    keyword set the reference grammar declares
    (syntaxes/flink.tmLanguage.json ALTER section; FLIP-273)."""
    m = re.match(r"(?is)^ALTER\s+TABLE\s+([\w`]+)\s+SET\s*\((.*)\)\s*;?\s*$", stmt)
    if m:
        name = m.group(1).strip("`")
        table = session.connector_tables.get(name)
        if table is None:
            # real catalog table → Spark TBLPROPERTIES
            props = m.group(2)
            session.spark.sql(f"ALTER TABLE {name} SET TBLPROPERTIES ({props})")
            return _c(("result", "string")), [["OK"]]
        # the shared parser owns the '' rule for keys AND values
        # (review r10 pass 6: three drifting copies)
        from flink_sql_toolkit_spark.sources.ddl import parse_option_pairs  # noqa: PLC0415

        table.options.update(parse_option_pairs(m.group(2)))
        return _refresh_altered(session, table)
    m = re.match(r"(?is)^ALTER\s+TABLE\s+([\w`]+)\s+RESET\s*\((.*)\)\s*;?\s*$", stmt)
    if m:
        name = m.group(1).strip("`")
        table = session.connector_tables.get(name)
        keys = [
            k.replace("''", "'")
            for k in re.findall(r"'((?:[^']|'')*)'", m.group(2))
        ]
        if table is None:
            from flink_sql_toolkit_spark.sources.ddl import (  # noqa: PLC0415
                escape_sql_quotes,
            )

            props = ", ".join(f"'{escape_sql_quotes(k)}'" for k in keys)
            session.spark.sql(f"ALTER TABLE {name} UNSET TBLPROPERTIES ({props})")
            return _c(("result", "string")), [["OK"]]
        if "connector" in keys:
            # Flink: ValidationException on resetting 'connector'
            raise ValueError("ALTER TABLE RESET does not support changing 'connector'")
        for k in keys:
            table.options.pop(k, None)
        return _refresh_altered(session, table)
    m = re.match(
        r"(?is)^ALTER\s+TABLE\s+([\w`]+)(?:\s+PARTITION\s*\(([^)]*)\))?\s+COMPACT\s*;?\s*$",
        stmt,
    )
    if m:
        from flink_sql_toolkit_spark.sources.dml import compact_table  # noqa: PLC0415

        return compact_table(session, m.group(1), m.group(2))
    m = re.match(
        r"(?is)^ALTER\s+TABLE\s+([\w`]+)\s+DROP\s+"
        r"(WATERMARK|(?:CONSTRAINT\s+\w+|PRIMARY\s+KEY)|\(([^)]*)\)|(?!PARTITION\b)[\w`]+)\s*;?\s*$",
        stmt,
    )
    if m:
        name = m.group(1).strip("`")
        table = session.connector_tables.get(name)
        what = m.group(2).strip()
        if table is None:
            if re.fullmatch(r"(?is)WATERMARK|PRIMARY\s+KEY|CONSTRAINT\s+\w+", what):
                raise NotImplementedError(
                    f"ALTER TABLE ... DROP {what.upper()} targets connector-registry tables"
                )
            # Spark's DROP COLUMNS spelling covers the keyword-less
            # single and list forms alike
            session.spark.sql(
                f"ALTER TABLE {name} DROP COLUMNS ({m.group(3) or what})"
            )
            return _c(("result", "string")), [["OK"]]
        if what.upper() == "WATERMARK":
            if table.watermark is None:
                raise LookupError(f"table '{name}' has no watermark to drop")
            table.watermark = None
            return _refresh_altered(session, table)
        if re.fullmatch(r"(?is)PRIMARY\s+KEY|CONSTRAINT\s+\w+", what):
            if not table.primary_key:
                raise LookupError(f"table '{name}' has no primary key to drop")
            table.primary_key = []
            return _refresh_altered(session, table)
        cols = [c.strip().strip("`") for c in (m.group(3) or what).split(",")]
        for col in cols:
            kind, target = _find_any_column(table, col)
            col = target.name  # canonical casing for the messages
            cl = col.lower()
            # specs store names as-written — compare case-insensitively
            # (review r10 pass 5: PRIMARY KEY (ID) let DROP id through,
            # stranding a dangling spec)
            used = (
                cl in (k.lower() for k in table.primary_key)
                or cl in (k.lower() for k in table.partitioned_by)
                or cl in (k.lower() for k in table.distributed_by)
                or (table.watermark and table.watermark.column.lower() == cl)
            )
            if used:
                raise ValueError(
                    f"cannot drop column '{col}': referenced by the table's "
                    f"key/partition/distribution/watermark spec"
                )
            # Flink-parity guard (FLIP-273): a column referenced by a
            # generated column's expression or the watermark expression
            # cannot be dropped — Flink rejects upfront rather than
            # leaving a dangling reference that fails at read time
            dep = _referencing_exprs(table, col)
            if dep:
                raise ValueError(
                    f"cannot drop column '{col}': referenced by {dep}"
                )
            if kind == "computed":
                table.computed = [c for c in table.computed if c is not target]
            elif kind == "metadata":
                table.metadata = [c for c in table.metadata if c is not target]
            else:
                table.columns = [c for c in table.columns if c is not target]
        return _refresh_altered(session, table)
    m = re.match(
        r"(?is)^ALTER\s+TABLE\s+([\w`]+)\s+MODIFY\s+"
        r"(?:WATERMARK\s+FOR\s+([\w`]+)\s+AS\s+(.*?)|([\w`]+)\s+(.+?))\s*;?\s*$",
        stmt,
    )
    if m:
        name = m.group(1).strip("`")
        table = session.connector_tables.get(name)
        if table is None:
            raise NotImplementedError(
                "ALTER TABLE ... MODIFY targets connector-registry tables"
            )
        from flink_sql_toolkit_spark.sources.ddl import (  # noqa: PLC0415
            flink_type_to_spark,
            parse_watermark,
        )

        if m.group(2):  # MODIFY WATERMARK FOR col AS expr
            col = m.group(2).strip("`")
            # a watermark may sit on a computed rowtime (the canonical
            # `ts AS TO_TIMESTAMP(...)` pattern) or a metadata column —
            # validate against all three kinds, matching the ADD path
            # (ADVICE r9: physical-only lookup falsely rejected these)
            _find_any_column(table, col)
            table.watermark = parse_watermark(col, m.group(3))
            return _refresh_altered(session, table)
        col = m.group(4).strip("`")
        tm = re.match(r"(?is)^(.+?)(\s+NOT\s+NULL)?(\s+COMMENT\s+'([^']*)')?$", m.group(5))
        kind, target = _find_any_column(table, col)
        if kind == "computed":
            # a computed column has no stored type to modify — its type
            # is its expression's (review r10 pass 6: the physical-only
            # lookup answered 'does not exist', a lie)
            raise ValueError(
                f"cannot MODIFY the type of computed column '{target.name}' "
                f"— DROP it and ADD the new definition"
            )
        if kind == "metadata" and (tm.group(2) or tm.group(4) is not None):
            # a metadata column stores neither nullability nor a comment
            # — silently applying only the type while dropping the rest
            # of the statement would return OK for work not done
            # (ADVICE r10)
            clause = "NOT NULL" if tm.group(2) else "COMMENT"
            raise ValueError(
                f"cannot MODIFY {clause} on metadata column "
                f"'{target.name}' — only its type can be modified"
            )
        target.spark_type = flink_type_to_spark(tm.group(1))
        if kind == "physical":
            target.nullable = not tm.group(2)
            if tm.group(4) is not None:
                target.comment = tm.group(4)
        return _refresh_altered(session, table)
    m = re.match(
        r"(?is)^ALTER\s+TABLE\s+([\w`]+)\s+RENAME\s+(?!TO\s)([\w`]+)\s+TO\s+([\w`]+)\s*;?\s*$",
        stmt,
    )
    if m:
        name = m.group(1).strip("`")
        table = session.connector_tables.get(name)
        old, new = m.group(2).strip("`"), m.group(3).strip("`")
        if table is None:
            session.spark.sql(f"ALTER TABLE {name} RENAME COLUMN {old} TO {new}")
            return _c(("result", "string")), [["OK"]]
        # a computed or metadata column is renameable too — the same
        # three-kind case-insensitive resolution DROP and MODIFY
        # WATERMARK use (review r10 #3 / pass 4)
        _kind, target = _find_any_column(table, old)
        old = target.name  # canonical casing
        taken = {
            c.name.lower()
            for group in (table.columns, table.computed, table.metadata)
            for c in group
            if c is not target  # a pure case-change rename stays legal;
            # other case-duplicate columns still collide (pass 5)
        }
        if new.lower() in taken:
            raise ValueError(f"column '{new}' already exists in table '{name}'")
        # Flink-parity guard (FLIP-273): renaming a column referenced
        # by a generated column's expression is rejected (the watermark
        # expression, by contrast, follows the rename below)
        dep = _referencing_exprs(table, old, include_watermark=False)
        if dep:
            raise ValueError(f"cannot rename column '{old}': referenced by {dep}")
        target.name = new
        ol = old.lower()
        table.primary_key = [new if c.lower() == ol else c for c in table.primary_key]
        table.partitioned_by = [new if c.lower() == ol else c for c in table.partitioned_by]
        table.distributed_by = [new if c.lower() == ol else c for c in table.distributed_by]
        if table.watermark:
            if table.watermark.column.lower() == ol:
                table.watermark.column = new
            # the delay expression follows the rename whether or not
            # the watermark is DECLARED on the renamed column — e.g.
            # WATERMARK FOR ts AS GREATEST(ts, backup_ts) - … must not
            # be left referencing the old backup_ts name (review r10);
            # the shared reference-aware substitution is literal-safe,
            # keyword-position-safe and backtick-aware (pass 4)
            table.watermark.delay_expr = _rename_in_expr(
                table.watermark.delay_expr, old, new
            )
        return _refresh_altered(session, table)
    m = re.match(
        r"(?is)^ALTER\s+TABLE\s+([\w`]+)\s+ADD\s+"
        r"(?:COLUMN\s+)?(?!PARTITION\b|IF\b)(?:\((.*)\)|([\w`]+.*?))\s*;?\s*$",
        stmt,
    )
    if m:
        name = m.group(1).strip("`")
        session.metadata.invalidate_table(name)
        table = session.connector_tables.get(name)
        if table is not None:
            import copy as _copy  # noqa: PLC0415

            from flink_sql_toolkit_spark.sources.ddl import (  # noqa: PLC0415
                _split_top,
                apply_body_part,
            )

            # FLIP-273: ADD takes the same item kinds as the CREATE
            # body — physical/computed/metadata columns, WATERMARK,
            # PRIMARY KEY — singly or as a parenthesized list
            parts = (
                _split_top(m.group(2)) if m.group(2) is not None else [m.group(3)]
            )
            probe = _copy.deepcopy(table)
            taken = {c.name for c in table.columns}
            taken |= {c.name for c in table.computed}
            taken |= {c.name for c in table.metadata}
            # duplicate-within-list detection compares against the
            # PROBE state, which advances per item (review r9: two
            # WATERMARK items in one list silently took last-wins)
            has_wm = table.watermark is not None
            has_pk = bool(table.primary_key)
            for p in parts:
                kind = apply_body_part(probe, p)
                if kind == "watermark":
                    if has_wm:
                        raise ValueError(
                            f"table '{name}' already has a watermark — use "
                            f"ALTER TABLE … MODIFY WATERMARK"
                        )
                    has_wm = True
                if kind == "primary_key":
                    if has_pk:
                        raise ValueError(
                            f"table '{name}' already has a primary key — drop it first"
                        )
                    has_pk = True
                if kind in ("column", "computed", "metadata"):
                    added = {
                        "column": probe.columns,
                        "computed": probe.computed,
                        "metadata": probe.metadata,
                    }[kind][-1].name
                    if added.lower() in {t.lower() for t in taken}:
                        raise ValueError(
                            f"column '{added}' already exists in table '{name}'"
                        )
                    taken.add(added)
            # an added watermark must reference a column the FINAL
            # table has (physical/computed/metadata) — MODIFY WATERMARK
            # validates the same way; a typo would otherwise return OK
            # and quarantine the table as unreadable (review r9)
            if probe.watermark is not None and probe.watermark.column.lower() not in {
                t.lower() for t in taken
            }:
                raise LookupError(
                    f"watermark column '{probe.watermark.column}' does not "
                    f"exist in table '{name}'"
                )
            for field in ("columns", "computed", "metadata", "watermark", "primary_key"):
                setattr(table, field, getattr(probe, field))
            return _refresh_altered(session, table)
        # non-connector target: Spark's ADD COLUMNS spelling covers the
        # single, keyword-less and list forms alike; temp views (which
        # Spark DDL can't alter) are widened in place
        cols_text = m.group(2) or m.group(3)
        try:
            session.spark.sql(f"ALTER TABLE {name} ADD COLUMNS ({cols_text})")
        except Exception:  # noqa: BLE001 — temp view target: widen in place
            from pyspark.sql import functions as F  # noqa: PLC0415
            from flink_sql_toolkit_spark.sources.ddl import (  # noqa: PLC0415
                _split_top,
                flink_type_to_spark as _ftts,
            )

            df = session.spark.table(name)
            for p in _split_top(cols_text):
                cm2 = re.match(r"(?s)^([\w`]+)\s+(.+)$", p.strip())
                df = df.withColumn(cm2.group(1).strip("`"), F.lit(None).cast(_ftts(cm2.group(2))))
            df.createOrReplaceTempView(name)
        return _c(("result", "string")), [["OK"]]
    m = re.match(r"(?is)^ALTER\s+TABLE\s+([\w`]+)\s+RENAME\s+TO\s+([\w`]+)\s*;?\s*$", stmt)
    if m:
        old, new = m.group(1).strip("`"), m.group(2).strip("`")
        session.metadata.invalidate()  # listings + both names' columns stale
        table = session.connector_tables.pop(old, None)
        if table is not None:
            table.name = new
            session.connector_tables[new] = table
            from flink_sql_toolkit_spark.sources.ddl import synthesize_ddl  # noqa: PLC0415

            session.connector_ddl.pop(old, None)
            session.connector_ddl[new] = synthesize_ddl(table)
            # the emulated-catalog browse registry follows the rename
            for cat in session.emulated_catalogs.catalogs.values():
                for db in cat.databases.values():
                    if old in db.tables:
                        db.tables.discard(old)
                        db.tables.add(new)
            df = session.spark.table(old)
            session.spark.catalog.dropTempView(old)
            df.createOrReplaceTempView(new)
            return _c(("result", "string")), [["OK"]]
        session.spark.sql(f"ALTER TABLE {old} RENAME TO {new}")
        return _c(("result", "string")), [["OK"]]
    return None


def handle_explain(session: "EngineSession", stmt: str) -> tuple[Cols, Rows] | None:
    m = re.match(
        r"(?is)^EXPLAIN\s+(PLAN\s+FOR\s+|ESTIMATED_COST\s+|CHANGELOG_MODE\s+|JSON_EXECUTION_PLAN\s+)?(.*)$",
        stmt.strip().rstrip(";"),
        re.DOTALL,
    )
    if not m or not m.group(2).strip():
        return None
    variant = (m.group(1) or "PLAN FOR").strip().upper()
    query = m.group(2)
    from flink_sql_toolkit_spark.dialect.rewriter import rewrite  # noqa: PLC0415

    df = session.spark.sql(rewrite(query))
    qe = df._jdf.queryExecution()
    if variant.startswith("ESTIMATED_COST"):
        text = qe.stringWithStats()
    elif variant.startswith("JSON_EXECUTION_PLAN"):
        text = qe.optimizedPlan().toJSON()
    elif variant.startswith("CHANGELOG_MODE"):
        mode = "append-only" if not df.isStreaming else session.flink_conf.get(
            "changelog-mode", "append (update/complete depend on the sink's outputMode)"
        )
        text = f"changelog mode: {mode}\n" + qe.explainString(
            session.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    else:
        text = qe.explainString(
            session.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    return _c(("plan", "string")), [[text]]
