"""Confluent Schema Registry client for the ``avro-confluent`` format.

The reference declares the registry-backed format as first-class DDL
surface (``'format' = 'avro-confluent'`` with ``avro-confluent.url``,
syntaxes/flink.tmLanguage.json:518; test/syntax-test.fsql:626-636).
Flink's format uses the registry two ways, both reproduced here over
the public Confluent REST API (stdlib urllib, no new deps):

- **deserialization**: every message's 5-byte header carries the
  WRITER schema id; the reader resolves that id against the registry
  (``GET /schemas/ids/{id}``) and decodes with the writer schema, so
  producers with different field orders / evolved schemas decode
  correctly. The resolution happens executor-side inside the Arrow
  decode mapper with a per-worker id→schema cache — one HTTP call per
  (worker, id), never per row. An unreachable registry falls back to
  the DECLARED (DDL-derived) schema — the pre-registry behavior —
  with a negative cache so a dead registry costs one timeout per
  worker, not one per batch; a schema id the registry does not know
  is a hard error (the message cannot be decoded correctly).
- **serialization**: the sink negotiates the value schema id by
  registering the DDL-derived schema under the subject
  (``POST /subjects/{subject}-value/versions``) when no explicit
  ``avro-confluent.schema-id`` is given — Flink's exact behavior.

Scale note: all registry traffic is O(distinct schema ids) per
worker (decode) or one call at plan time (sink) — nothing here is on
the per-row path.
"""

from __future__ import annotations

import base64
import json
import urllib.error
import urllib.request
from typing import Any

# Confluent's content type; the registry answers plain JSON either way
_CONTENT_TYPE = "application/vnd.schemaregistry.v1+json"


class SchemaRegistryError(RuntimeError):
    """Registry answered, but with an error (bad id/subject/schema)."""


class SchemaRegistryClient:
    """Minimal Confluent REST client with an id→schema cache.

    ``user_info`` is Flink's ``avro-confluent.basic-auth.user-info``
    (``user:password``, sent when ``credentials-source`` = USER_INFO).
    """

    def __init__(
        self, url: str, user_info: str | None = None, timeout: float = 5.0
    ):
        self.url = url.rstrip("/")
        self.timeout = timeout
        self._auth = (
            "Basic " + base64.b64encode(user_info.encode()).decode("ascii")
            if user_info
            else None
        )
        self._by_id: dict[int, dict | str] = {}

    def _request(self, path: str, body: dict | None = None) -> Any:
        req = urllib.request.Request(
            f"{self.url}{path}",
            data=json.dumps(body).encode() if body is not None else None,
            method="POST" if body is not None else "GET",
            headers={"Content-Type": _CONTENT_TYPE, "Accept": _CONTENT_TYPE},
        )
        if self._auth:
            req.add_header("Authorization", self._auth)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as e:
            # registry error shape: {"error_code": N, "message": "..."}
            try:
                detail = json.loads(e.read()).get("message", "")
            except Exception:  # noqa: BLE001
                detail = ""
            raise SchemaRegistryError(
                f"schema registry {self.url}{path} answered {e.code}: {detail}"
            ) from e

    # -- deserialization side ------------------------------------------

    def get_schema_by_id(self, schema_id: int) -> dict | str:
        """Writer schema for a wire-format id (GET /schemas/ids/{id});
        cached — repeat calls for the same id make no HTTP request."""
        if schema_id not in self._by_id:
            out = self._request(f"/schemas/ids/{schema_id}")
            self._by_id[schema_id] = json.loads(out["schema"])
        return self._by_id[schema_id]

    # -- serialization side --------------------------------------------

    def register(self, subject: str, schema: dict | str) -> int:
        """Register (or look up — the registry dedups identical
        schemas) under ``subject`` and return the wire-format id."""
        payload = schema if isinstance(schema, str) else json.dumps(schema)
        out = self._request(
            f"/subjects/{subject}/versions", body={"schema": payload}
        )
        return int(out["id"])

    def get_latest(self, subject: str) -> tuple[int, dict | str]:
        out = self._request(f"/subjects/{subject}/versions/latest")
        return int(out["id"]), json.loads(out["schema"])


def registry_options(options: dict[str, str]) -> dict[str, str] | None:
    """Extract the registry connection settings from the table's WITH
    options (the Flink option names); None when no url is configured.
    Returned as a plain picklable dict — the decode mapper rebuilds
    the client executor-side from it."""
    url = options.get("avro-confluent.url", "").strip()
    if not url:
        return None
    out = {"url": url}
    if (
        options.get("avro-confluent.basic-auth.credentials-source", "").upper()
        == "USER_INFO"
    ):
        info = options.get("avro-confluent.basic-auth.user-info", "")
        if info:
            out["user_info"] = info
    # opt-in ONLY: decode unknown writer ids with the declared reader
    # schema while the registry is unreachable. Flink's avro-confluent
    # deserializer hard-fails on registry unavailability — silent
    # reader-schema decode of an evolved writer's frames yields
    # misaligned garbage values, so unavailability must be loud by
    # default (ADVICE r10).
    if options.get(
        "avro-confluent.reader-schema-fallback", ""
    ).strip().lower() in ("true", "1", "yes"):
        out["reader_schema_fallback"] = "true"
    return out


def subject_for(table_options: dict[str, str]) -> str:
    """Flink's subject resolution: explicit ``avro-confluent.subject``,
    else ``{topic}-value`` (the value-format default)."""
    explicit = table_options.get("avro-confluent.subject", "").strip()
    if explicit:
        return explicit
    return f"{table_options.get('topic', 'output')}-value"
