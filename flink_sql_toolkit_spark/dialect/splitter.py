"""Quote/comment-aware statement splitter.

The reference splits notebook cells on a bare ``;``
(src/notebookController.ts:88-92), which corrupts semicolons inside
string literals or comments. This splitter tracks single/double
quotes, backtick identifiers, ``--`` line comments, and ``/* */``
block comments (nesting not required by the corpus), and understands
``BEGIN STATEMENT SET ... END;`` as one compound statement
(test/syntax-test.fsql:183-186).
"""

from __future__ import annotations

import re


def strip_leading_comments(stmt: str) -> str:
    """Remove leading -- and /* */ comments (statement dispatch is
    anchored at the first real token)."""
    i, n = 0, len(stmt)
    while i < n:
        if stmt[i].isspace():
            i += 1
        elif stmt.startswith("--", i):
            j = stmt.find("\n", i)
            i = n if j < 0 else j + 1
        elif stmt.startswith("/*", i) and not stmt.startswith("/*+", i):
            j = stmt.find("*/", i + 2)
            i = n if j < 0 else j + 2
        else:
            break
    return stmt[i:]


def split_statements(script: str) -> list[str]:
    statements: list[str] = []
    buf: list[str] = []
    i, n = 0, len(script)
    in_stmt_set = False
    while i < n:
        ch = script[i]
        nxt = script[i + 1] if i + 1 < n else ""
        if ch == "-" and nxt == "-":
            j = script.find("\n", i)
            j = n if j < 0 else j
            buf.append(script[i:j])
            i = j
            continue
        if ch == "/" and nxt == "*":
            j = script.find("*/", i + 2)
            j = n - 2 if j < 0 else j
            buf.append(script[i : j + 2])
            i = j + 2
            continue
        if ch in ("'", '"', "`"):
            j = i + 1
            while j < n:
                if script[j] == ch:
                    # '' escape inside single quotes
                    if ch == "'" and j + 1 < n and script[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            buf.append(script[i : j + 1])
            i = j + 1
            continue
        if ch == ";":
            text = "".join(buf)
            if in_stmt_set:
                if re.search(r"(?i)(^|[\s;])END\s*$", text):
                    in_stmt_set = False
                    statements.append(text.strip() + ";")
                    buf = []
                else:
                    buf.append(";")
                i += 1
                continue
            if text.strip():
                statements.append(text.strip())
            buf = []
            i += 1
            continue
        buf.append(ch)
        if not in_stmt_set:
            tail = "".join(buf[-40:]).upper()
            if re.search(r"(?:^|\s)BEGIN\s+STATEMENT\s+SET$", tail):
                in_stmt_set = True
        i += 1
    tail_text = "".join(buf).strip()
    if tail_text:
        statements.append(tail_text)
    return statements
