"""Metadata access layer: TTL cache, in-flight dedup, completions.

Replicates the reference's two metadata consumers on the engine side:

- ``MetadataCache`` — TTL-based cache with request deduplication and
  failed-fetch eviction (src/catalogProvider.ts:21-26,349-377): a
  fetch within the TTL returns cached data; concurrent fetches for
  the same key share one in-flight request; a failed fetch is removed
  so the next call retries.
- ``CatalogMetadata`` — cached catalog/database/table/column listings
  keyed the way the reference keys them (`catalogs`, `dbs:{catalog}`,
  `tables:current`, `columns:{ref}` — src/completionProvider.ts:12-16)
  with prefix invalidation mirroring the tree refresh paths
  (src/catalogProvider.ts:248-279).
- ``completions`` — the completion-provider metadata API
  (src/completionProvider.ts:69-172): keywords + functions always;
  ``catalog.`` → databases, ``catalog.db.`` → tables, ``alias.`` →
  that table's columns (aliases resolved from FROM/JOIN clauses);
  bare prefix → catalogs + current-context tables + columns of every
  referenced table.
"""

from __future__ import annotations

import re
import threading
import time
from typing import TYPE_CHECKING, Any, Callable

if TYPE_CHECKING:  # pragma: no cover
    from flink_sql_toolkit_spark.engine import EngineSession

CACHE_TTL_S = 60.0  # reference: CACHE_TTL_MS = 60000 (catalogProvider.ts:23)


class _Pending:
    """One in-flight fetch; followers block on the leader's outcome."""

    def __init__(self) -> None:
        self.event = threading.Event()
        self.data: Any = None
        self.error: BaseException | None = None

    def resolve(self, data: Any) -> None:
        self.data = data
        self.event.set()

    def reject(self, error: BaseException) -> None:
        self.error = error
        self.event.set()

    def wait(self) -> Any:
        self.event.wait()
        if self.error is not None:
            raise self.error
        return self.data


class MetadataCache:
    """TTL cache + in-flight request dedup (catalogProvider.ts:349-377).

    ``clock`` is injectable for tests; defaults to ``time.monotonic``.
    """

    def __init__(self, ttl_s: float = CACHE_TTL_S, clock: Callable[[], float] = time.monotonic):
        self.ttl_s = ttl_s
        self._clock = clock
        self._lock = threading.Lock()
        self._cache: dict[str, tuple[Any, float]] = {}
        self._pending: dict[str, _Pending] = {}
        self.fetch_count = 0  # diagnostic: number of real fetcher runs

    def get(self, key: str, fetcher: Callable[[], Any]) -> Any:
        with self._lock:
            hit = self._cache.get(key)
            if hit is not None and (self._clock() - hit[1]) < self.ttl_s:
                return hit[0]
            pending = self._pending.get(key)
            if pending is not None:
                leader = False
            else:
                pending = _Pending()
                self._pending[key] = pending
                leader = True
        if not leader:
            return pending.wait()
        try:
            data = fetcher()
        except BaseException as e:
            with self._lock:
                # failed request: drop from cache so the next call retries
                self._pending.pop(key, None)
                self._cache.pop(key, None)
            pending.reject(e)
            raise
        with self._lock:
            self.fetch_count += 1
            self._cache[key] = (data, self._clock())
            self._pending.pop(key, None)
        pending.resolve(data)
        return data

    def invalidate(self, prefix: str | None = None) -> None:
        """Drop everything, or only keys under ``prefix`` — the
        reference's full clear vs per-node refresh (catalogProvider.ts:
        49-50, 258-260, 277-279)."""
        with self._lock:
            if prefix is None:
                self._cache.clear()
                self._pending.clear()
                return
            for store in (self._cache, self._pending):
                for key in [k for k in store if k.startswith(prefix)]:
                    del store[key]


class CatalogMetadata:
    """Session-scoped cached metadata listings."""

    def __init__(self, session: "EngineSession", ttl_s: float = CACHE_TTL_S):
        self.session = session
        self.cache = MetadataCache(ttl_s=ttl_s)

    # -- cached fetchers (completionProvider.ts:218-309 key scheme) ---

    def catalogs(self) -> list[str]:
        return self.cache.get(
            "catalogs",
            lambda: [c.name for c in self.session.spark.catalog.listCatalogs()],
        )

    def databases(self, catalog: str | None = None) -> list[str]:
        key = f"dbs:{catalog or self.session.spark.catalog.currentCatalog()}"
        return self.cache.get(
            key, lambda: [d.name for d in self.session.spark.catalog.listDatabases()]
        )

    def tables(self) -> list[str]:
        """Current-context tables, connector registry included (the
        engine's SHOW TABLES contract)."""

        def fetch() -> list[str]:
            names = {t.name for t in self.session.spark.catalog.listTables()}
            names.update(self.session.connector_tables)
            return sorted(names)

        return self.cache.get("tables:current", fetch)

    def views(self) -> list[str]:
        def fetch() -> list[str]:
            # connector tables are *implemented* as temp views but are
            # TABLEs to the user — SHOW VIEWS must not list them: the
            # reference client classifies objects as "SHOW TABLES minus
            # the SHOW VIEWS set" (src/flinkClient.ts:386-408), so a
            # connector table leaking into SHOW VIEWS renders as a VIEW
            # in its catalog tree (found by the r11 node conformance
            # harness).
            ct = {n.lower() for n in self.session.connector_tables}
            return sorted(
                t.name
                for t in self.session.spark.catalog.listTables()
                if t.tableType in ("TEMPORARY", "VIEW")
                and t.name.lower() not in ct
            )

        return self.cache.get("views:current", fetch)

    def functions(self) -> list[str]:
        return self.cache.get(
            "functions:current",
            lambda: [f.name for f in self.session.spark.catalog.listFunctions()],
        )

    def columns(self, table_ref: str) -> list[str]:
        """Column names for a table reference (connector-registry table
        or any relation Spark can resolve). Unresolvable → [] — the
        reference's completion fetchers swallow errors the same way."""
        ref = table_ref.replace("`", "")

        def fetch() -> list[str]:
            ct = self.session.connector_tables.get(ref)
            if ct is not None:
                return (
                    [c.name for c in ct.columns]
                    + [m.name for m in ct.metadata]
                    + [c.name for c in ct.computed]
                )
            try:
                fields = self.session.spark.sql(f"SELECT * FROM {ref} WHERE 1=0").schema.fields
                return [f.name for f in fields]
            except Exception:  # noqa: BLE001 — unknown relation → no columns
                return []

        return self.cache.get(f"columns:{ref}", fetch)

    def describe_rows(self, table_ref: str, fetch: Callable[[], Any]) -> Any:
        """Cache a DESCRIBE result (the 6-column Flink shape) per
        table — the webview's detail fetch path
        (src/objectDetailsProvider.ts:122-133)."""
        return self.cache.get(f"describe:{table_ref.replace('`', '')}", fetch)

    def invalidate(self, prefix: str | None = None) -> None:
        self.cache.invalidate(prefix)

    def invalidate_table(self, name: str) -> None:
        """Drop one table's cached schema (columns + DESCRIBE rows)."""
        self.cache.invalidate(f"columns:{name}")
        self.cache.invalidate(f"describe:{name}")


# -- completion surface (completionProvider.ts:31-67) -----------------

DDL_KEYWORDS = [
    "CREATE", "DROP", "ALTER", "TABLE", "VIEW", "DATABASE", "CATALOG", "FUNCTION",
    "TEMPORARY", "SYSTEM", "IF EXISTS", "IF NOT EXISTS", "COMMENT", "PARTITIONED BY",
    "WITH", "LIKE", "AS",
    # ALTER subforms + FLIP-376 bucketing (grammar keyword rows 203, 371)
    "ADD", "MODIFY", "RENAME", "RESET", "COMPACT", "DISTRIBUTED BY",
    "INTO", "BUCKETS", "WATERMARK", "PRIMARY KEY",
]
DML_KEYWORDS = [
    "SELECT", "INSERT INTO", "INSERT OVERWRITE", "UPDATE", "DELETE", "MERGE INTO",
    "VALUES", "DISTINCT", "ALL",
]
SQL_KEYWORDS = [
    "FROM", "WHERE", "GROUP BY", "HAVING", "ORDER BY", "LIMIT", "OFFSET",
    "JOIN", "INNER JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN", "CROSS JOIN",
    "ON", "USING", "UNION", "INTERSECT", "EXCEPT", "IN", "EXISTS", "BETWEEN",
    "AND", "OR", "NOT", "IS NULL", "IS NOT NULL", "CASE", "WHEN", "THEN",
    "ELSE", "END", "CAST", "TRY_CAST", "LATERAL", "UNNEST", "TABLE",
]
BUILTIN_FUNCTIONS = [
    "COUNT", "SUM", "AVG", "MIN", "MAX", "COLLECT", "LISTAGG",
    "SUBSTRING", "CHAR_LENGTH", "UPPER", "LOWER", "TRIM", "REGEXP_REPLACE",
    "CONCAT", "CONCAT_WS", "INITCAP", "LIKE",
    "CURRENT_TIMESTAMP", "CURRENT_DATE", "CURRENT_TIME", "LOCALTIMESTAMP",
    "DATE_FORMAT", "TIMESTAMPADD", "TIMESTAMPDIFF", "EXTRACT",
    "FLOOR", "CEIL",
    "TUMBLE", "HOP", "SESSION", "CUMULATE",
    "COALESCE", "NULLIF", "IF",
    "ARRAY", "MAP", "ROW",
]

# FROM/JOIN table references with optional alias — the reference's
# extractTableReferences regex (completionProvider.ts:180)
_TABLE_REF_RE = re.compile(
    r"(?:FROM|JOIN)\s+([`\w\-.]+)(?:\s+(?:AS\s+)?(?!ON\b|WHERE\b|GROUP\b|ORDER\b|LEFT\b"
    r"|RIGHT\b|FULL\b|INNER\b|CROSS\b|JOIN\b|LIMIT\b|HAVING\b|UNION\b)(`?[\w\-]+`?))?",
    re.IGNORECASE,
)
_DOT_RE = re.compile(r"([`\w\-]+)\.$")
_DOUBLE_DOT_RE = re.compile(r"([`\w\-]+)\.([`\w\-]+)\.$")


def extract_table_references(sql_text: str) -> list[dict[str, str]]:
    """``FROM``/``JOIN`` targets with their (implicit) aliases
    (completionProvider.ts:174-202)."""
    refs = []
    for m in _TABLE_REF_RE.finditer(sql_text):
        full_path = m.group(1).replace("`", "").rstrip(".")
        table_name = full_path.rsplit(".", 1)[-1]
        alias = (m.group(2) or table_name).replace("`", "")
        refs.append({"tableName": table_name, "alias": alias, "fullPath": full_path})
    return refs


def completions(
    session: "EngineSession", sql_text: str, line_prefix: str | None = None
) -> list[dict[str, str]]:
    """Completion items for a cursor position: ``{"label", "kind"}``
    dicts, kinds mirroring the reference's CompletionItemKind usage
    (keyword, function, catalog, database, table, column)."""
    if line_prefix is None:
        line_prefix = sql_text.rsplit("\n", 1)[-1]
    meta = session.metadata
    items: list[dict[str, str]] = []

    def add(labels: list[str], kind: str) -> None:
        items.extend({"label": lb, "kind": kind} for lb in labels)

    # 1. keywords — suppressed inside dot notation (ts:84-90)
    in_dot = line_prefix.rstrip().endswith(".")
    if not in_dot:
        add(DDL_KEYWORDS, "keyword")
        add(DML_KEYWORDS, "keyword")
        add(SQL_KEYWORDS, "keyword")
        add(BUILTIN_FUNCTIONS, "function")

    # 2. metadata items (ts:107-171)
    refs = extract_table_references(sql_text)
    double_dot = _DOUBLE_DOT_RE.search(line_prefix)
    dot = _DOT_RE.search(line_prefix)
    emu = getattr(session, "emulated_catalogs", None)
    if double_dot:
        # catalog.database. → tables
        cat = emu.catalogs.get(double_dot.group(1).replace("`", "")) if emu else None
        db = cat.databases.get(double_dot.group(2).replace("`", "")) if cat else None
        if db is not None:  # DDL-created catalog: its own browse tree
            add(sorted(db.tables), "table")
        else:
            add(meta.tables(), "table")
    elif dot:
        identifier = dot.group(1).replace("`", "")
        for ref in refs:
            if identifier in (ref["alias"], ref["tableName"]):
                add(meta.columns(ref["fullPath"]), "column")
        if emu and identifier in emu.catalogs:
            add(sorted(emu.catalogs[identifier].databases), "database")
        elif identifier in meta.catalogs():
            add(meta.databases(identifier), "database")
    else:
        add(meta.catalogs(), "catalog")
        if emu:
            add(sorted(emu.catalogs), "catalog")
        add(meta.tables(), "table")
        for ref in refs:
            add(meta.columns(ref["fullPath"]), "column")
    return items
