"""CREATE TABLE grammar: clause-aware parsing of the reference's real DDL.

The reference's own stateless tests exercise the full MergeTree DDL surface
(ParserCreateQuery.cpp): ``ORDER BY tuple()``, expression sort keys
(``ORDER BY intHash32(k)``), ``INDEX name expr TYPE bloom_filter(...)
GRANULARITY n`` declarations inside the column list, ``DEFAULT`` /
``MATERIALIZED`` / ``ALIAS`` column expressions, backticked + dotted
Nested names (`` `c.d` Array(Date) ``), trailing ``SETTINGS``, and
``COMMENT``.  A tail regex cannot parse parenthesized expressions — this
module is the clause scanner the round-7 verdict asked for.

Semantics implemented by the caller (frontend/sql.py):
  * ORDER BY / PRIMARY KEY / SAMPLE BY / UNIQUE KEY / CLUSTER BY /
    SETTINGS — accepted and recorded (Spark has no physical analogue for a
    session temp view; the persistent write path handles real layout).
  * INDEX declarations — recorded; the token-index subsystem handles real
    pruning for hasToken; other index types are accept-and-record exactly
    like the reference accepts unknown-benefit indexes.
  * DEFAULT — column visible in ``SELECT *``; INSERTs that omit it
    evaluate the expression (InterpreterInsertQuery fills defaults).
  * MATERIALIZED — stored, computed at INSERT, hidden from ``SELECT *``.
  * ALIAS — never stored, computed on read when referenced, hidden from
    ``SELECT *`` (reference ColumnsDescription::get visibility rules).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class DDLError(ValueError):
    pass


# --------------------------------------------------------------------- utils

def _skip_string(s: str, i: int) -> int:
    """i points at an opening quote; return index AFTER the closing quote."""
    q = s[i]
    i += 1
    n = len(s)
    while i < n:
        if q == "'" and s[i] == "\\":
            i += 2
            continue
        if s[i] == q:
            if q == "'" and s[i + 1 : i + 2] == "'":
                i += 2
                continue
            return i + 1
        i += 1
    return n


def split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren depth 0, quote-aware."""
    out, cur, depth = [], [], 0
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c in ("'", "`", '"'):
            j = _skip_string(s, i)
            cur.append(s[i:j])
            i = j
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == sep and depth == 0:
            out.append("".join(cur))
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    out.append("".join(cur))
    return [p for p in (x.strip() for x in out) if p]


def _find_keyword_positions(s: str, keywords: list[str]) -> list[tuple]:
    """(position, keyword) of every depth-0, quote-safe keyword match."""
    pats = [
        (kw, re.compile(r"\b" + r"\s+".join(kw.split()) + r"\b", re.IGNORECASE))
        for kw in keywords
    ]
    hits = []
    depth = 0
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c in ("'", "`", '"'):
            i = _skip_string(s, i)
            continue
        if c == "(":
            depth += 1
            i += 1
            continue
        if c == ")":
            depth -= 1
            i += 1
            continue
        if depth == 0 and (c.isalpha() or c == "_"):
            # word start only (previous char is not a word char)
            if i > 0 and (s[i - 1].isalnum() or s[i - 1] == "_"):
                i += 1
                continue
            for kw, pat in pats:
                m = pat.match(s, i)
                if m:
                    hits.append((i, kw, m.end()))
                    i = m.end()
                    break
            else:
                while i < n and (s[i].isalnum() or s[i] == "_"):
                    i += 1
            continue
        i += 1
    return hits


# ------------------------------------------------------------- tail clauses

_TAIL_KEYWORDS = [
    "ENGINE", "PARTITION BY", "PRIMARY KEY", "ORDER BY", "UNIQUE KEY",
    "SAMPLE BY", "CLUSTER BY", "TTL", "SETTINGS", "COMMENT",
]


@dataclass
class CreateTail:
    engine: str | None = None
    engine_args: str | None = None
    partition_by: str | None = None
    primary_key: str | None = None
    order_by: str | None = None
    unique_key: str | None = None
    sample_by: str | None = None
    cluster_by: str | None = None
    ttl: str | None = None
    settings: dict = field(default_factory=dict)
    comment: str | None = None


def parse_create_tail(tail: str) -> CreateTail:
    """Everything after the column list (or after the table name for
    AS-SELECT forms, up to AS): clause keyword → expression text."""
    tail = tail.strip().rstrip(";").strip()
    out = CreateTail()
    if not tail:
        return out
    hits = _find_keyword_positions(tail, _TAIL_KEYWORDS)
    if not hits:
        raise DDLError(f"CREATE TABLE: unparsed tail {tail!r}")
    if tail[: hits[0][0]].strip():
        raise DDLError(
            f"CREATE TABLE: unparsed text before {hits[0][1]}: "
            f"{tail[:hits[0][0]]!r}"
        )
    for idx, (pos, kw, vstart) in enumerate(hits):
        vend = hits[idx + 1][0] if idx + 1 < len(hits) else len(tail)
        val = tail[vstart:vend].strip()
        if kw == "ENGINE":
            val = val.lstrip("= \t\n")
            m = re.match(r"(\w+)\s*(?:\((.*)\))?\s*$", val, re.DOTALL)
            if not m:
                raise DDLError(f"CREATE TABLE: bad ENGINE clause {val!r}")
            out.engine, out.engine_args = m.group(1), m.group(2)
        elif kw == "PARTITION BY":
            out.partition_by = val
        elif kw == "PRIMARY KEY":
            out.primary_key = val
        elif kw == "ORDER BY":
            out.order_by = val
        elif kw == "UNIQUE KEY":
            out.unique_key = val
        elif kw == "SAMPLE BY":
            out.sample_by = val
        elif kw == "CLUSTER BY":
            out.cluster_by = val
        elif kw == "TTL":
            out.ttl = val
        elif kw == "SETTINGS":
            for item in split_top_level(val):
                k, _, v = item.partition("=")
                if not _:
                    raise DDLError(
                        f"CREATE TABLE: bad SETTINGS item {item!r}"
                    )
                out.settings[k.strip()] = v.strip()
        elif kw == "COMMENT":
            out.comment = val.strip().strip("'")
    return out


def key_list(expr: str | None) -> list[str]:
    """ORDER BY/PRIMARY KEY expression → list of key expressions.
    ``tuple()`` (the reference's explicit 'no sort key') → []."""
    if not expr:
        return []
    e = expr.strip()
    m = re.fullmatch(r"tuple\s*\((.*)\)", e, re.IGNORECASE | re.DOTALL)
    if m:
        e = m.group(1).strip()
        return split_top_level(e) if e else []
    if e.startswith("(") and e.endswith(")"):
        inner = e[1:-1]
        return split_top_level(inner)
    return split_top_level(e)


# -------------------------------------------------------------- column list

_MODIFIER_KEYWORDS = [
    "DEFAULT", "MATERIALIZED", "ALIAS", "CODEC", "TTL", "COMMENT",
    "NOT NULL", "NULL", "KV", "BYTE", "BITMAPINDEX", "SEGMENTBITMAPINDEX",
    "BLOOM", "AUTO_INCREMENT",
]
# expression TERMINATORS exclude NULL/NOT NULL — they legally appear inside
# DEFAULT/TTL expressions (`d DEFAULT NULL`, `x IS NOT NULL`)
_EXPR_TERMINATORS = [
    "DEFAULT", "MATERIALIZED", "ALIAS", "CODEC", "COMMENT",
]


@dataclass
class ColumnDef:
    name: str
    ch_type: str | None  # None = inferred from DEFAULT (CH allows it)
    kind: str | None = None  # None | DEFAULT | MATERIALIZED | ALIAS
    expr: str | None = None
    codec: str | None = None
    ttl: str | None = None
    comment: str | None = None
    not_null: bool = False
    map_kind: str | None = None  # None | KV | BYTE (Map storage variant)
    auto_increment: bool = False  # MySQL-compat fill-at-insert


@dataclass
class IndexDef:
    name: str
    expr: str
    type: str
    granularity: str | None = None


@dataclass
class CreateBody:
    columns: list = field(default_factory=list)
    indexes: list = field(default_factory=list)
    constraints: list = field(default_factory=list)
    projections: list = field(default_factory=list)


def _parse_column_item(item: str) -> ColumnDef:
    item = item.strip()
    # name: backticked (may contain dots) / double-quoted / bare word
    if item[0] in ("`", '"'):
        j = _skip_string(item, 0)
        name = item[1 : j - 1]
        rest = item[j:].strip()
    else:
        m = re.match(r"([A-Za-z_]\w*(?:\.\w+)*)", item)
        if not m:
            raise DDLError(f"CREATE TABLE: bad column declaration {item!r}")
        name = m.group(1)
        rest = item[m.end() :].strip()

    col = ColumnDef(name=name, ch_type=None)

    # type (absent when the declaration is `name DEFAULT expr`)
    mod_pat = re.compile(
        r"^(" + "|".join(k.replace(" ", r"\s+") for k in _MODIFIER_KEYWORDS)
        + r")\b",
        re.IGNORECASE,
    )
    if rest and not mod_pat.match(rest):
        tm = re.match(r"([A-Za-z_]\w*)", rest)
        if not tm:
            raise DDLError(f"CREATE TABLE: bad type in {item!r}")
        tend = tm.end()
        ws = rest[tend:].lstrip()
        if ws.startswith("("):
            open_p = rest.index("(", tend)
            depth = 0
            k = open_p
            while k < len(rest):
                if rest[k] in ("'", "`", '"'):
                    k = _skip_string(rest, k)
                    continue
                if rest[k] == "(":
                    depth += 1
                elif rest[k] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                k += 1
            if depth != 0:
                raise DDLError(f"CREATE TABLE: unbalanced type in {item!r}")
            tend = k + 1
        col.ch_type = rest[:tend].strip()
        rest = rest[tend:].strip()

    # modifiers, in any order
    while rest:
        m = mod_pat.match(rest)
        if not m:
            raise DDLError(
                f"CREATE TABLE: unparsed column modifier {rest!r} "
                f"(column {name!r})"
            )
        kw = re.sub(r"\s+", " ", m.group(1).upper())
        rest = rest[m.end() :].strip()
        if kw in ("DEFAULT", "MATERIALIZED", "ALIAS"):
            nxt = _find_keyword_positions(rest, _EXPR_TERMINATORS)
            end = nxt[0][0] if nxt else len(rest)
            col.kind, col.expr = kw, rest[:end].strip()
            rest = rest[end:].strip()
        elif kw == "CODEC":
            if not rest.startswith("("):
                raise DDLError(f"CREATE TABLE: CODEC needs (...) in {item!r}")
            depth, k = 0, 0
            while k < len(rest):
                if rest[k] == "(":
                    depth += 1
                elif rest[k] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                k += 1
            col.codec = rest[1:k]
            rest = rest[k + 1 :].strip()
        elif kw == "TTL":
            nxt = _find_keyword_positions(rest, _EXPR_TERMINATORS)
            end = nxt[0][0] if nxt else len(rest)
            col.ttl = rest[:end].strip()
            rest = rest[end:].strip()
        elif kw == "COMMENT":
            sm = re.match(r"'((?:[^']|'')*)'", rest)
            if not sm:
                raise DDLError(f"CREATE TABLE: bad COMMENT in {item!r}")
            col.comment = sm.group(1)
            rest = rest[sm.end() :].strip()
        elif kw == "NOT NULL":
            col.not_null = True
        elif kw == "NULL":
            pass  # nullable is the default here
        elif kw in ("BITMAPINDEX", "SEGMENTBITMAPINDEX", "BLOOM"):
            pass  # skip-index layout hints (MergeTreeBitmapIndex /
            # bloom filter column annotation, 00943_..._mutate)
        elif kw == "AUTO_INCREMENT":
            col.auto_increment = True  # MySQL-compat fill-at-insert
        elif kw in ("KV", "BYTE"):
            # ByteDance Map storage variants: layout hints, except that
            # KV maps reject the implicit-column surface (getMapKeys
            # raises BAD_ARGUMENTS on them — frontend checks map_kind)
            col.map_kind = kw
    if col.ch_type is None and col.kind is None:
        raise DDLError(
            f"CREATE TABLE: column {name!r} has neither a type nor a "
            f"DEFAULT/MATERIALIZED/ALIAS expression"
        )
    return col


def parse_create_body(inner: str) -> CreateBody:
    """The text between the CREATE TABLE parens: columns, INDEX,
    CONSTRAINT and PROJECTION declarations."""
    body = CreateBody()
    for item in split_top_level(inner):
        up = item.upper()
        if up.startswith("INDEX "):
            m = re.match(
                r"INDEX\s+(`[^`]+`|[A-Za-z_]\w*)\s+(.+?)"
                r"\s+TYPE\s+(\w+(?:\([^)]*\))?)"
                r"(?:\s+GRANULARITY\s+(\d+))?\s*$",
                item, re.IGNORECASE | re.DOTALL,
            )
            if not m:
                raise DDLError(f"CREATE TABLE: bad INDEX declaration {item!r}")
            body.indexes.append(
                IndexDef(m.group(1), m.group(2).strip(), m.group(3),
                         m.group(4))
            )
        elif up.startswith(("CONSTRAINT ", "FOREIGN KEY", "CHECK ",
                            "CHECK(", "UNIQUE KEY", "UNIQUE(", "UNIQUE ",
                            "PRIMARY KEY")):
            # table-level constraint declarations (reference
            # ConstraintsDescription + the MySQL-compat FOREIGN KEY /
            # UNIQUE forms) — recorded, not enforced, like the reference
            body.constraints.append(item)
        elif up.startswith("PROJECTION "):
            body.projections.append(item)
        else:
            col = _parse_column_item(item)
            nm = re.fullmatch(
                r"(?is)\s*Nested\s*\((.+)\)\s*", col.ch_type or ""
            )
            if nm:
                # Nested(a T1, b T2) IS sibling arrays `n.a`, `n.b` in
                # the reference's physical model (DataTypeNested
                # flattens to dotted Array columns) — expanding here
                # makes INSERT binding, ALTER ADD COLUMN n.b, and
                # per-subcolumn defaults fall out of the existing
                # dotted-name machinery (00576)
                for sub in split_top_level(nm.group(1)):
                    sm = re.match(
                        r"(`[^`]+`|\w+)\s+(\S.*)$", sub.strip(),
                        re.DOTALL,
                    )
                    if not sm:
                        raise DDLError(
                            f"CREATE TABLE: bad Nested item {sub!r}"
                        )
                    body.columns.append(ColumnDef(
                        name=f"{col.name}.{sm.group(1).strip('`')}",
                        ch_type=f"Array({sm.group(2).strip()})",
                    ))
                continue
            body.columns.append(col)
    if not body.columns:
        raise DDLError("CREATE TABLE: no columns declared")
    return body
