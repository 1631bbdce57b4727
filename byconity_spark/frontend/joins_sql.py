"""ASOF / ANY JOIN in the ClickHouse SQL frontend.

ClickHouse join STRICTNESS (ASOF, ANY — reference:
src/Parsers/ASTTablesInSelectQuery.h:123-132, ASOF inequality handling in
src/Interpreters/RowRefs.h) has no text-level Spark SQL equivalent, so these
queries route through the operator API instead of the string rewriter:
parse the single strict join, build the joined DataFrame with
``operators.joins.asof_join`` / ``any_join``, register it as a temp view,
then run the REST of the query (select list, WHERE, GROUP BY, ORDER BY,
LIMIT — still ClickHouse dialect) through the normal rewriter against that
view.

Supported shape (one strict join; named-table or subquery sides — subqueries
run through ch_sql and register as temp views first):

    SELECT ... FROM <ltable|(SELECT ...)> [AS] [lalias]
    ASOF|ANY [LEFT|INNER] JOIN <rtable|(SELECT ...)> [AS] [ralias]
    ON l.k = r.k [AND ...] [AND l.t >= r.t]      -- or USING (k, ..., t)
    [JOIN <more ordinary joins> ...]
    [WHERE ...] [GROUP BY ...] [ORDER BY ...] [LIMIT ...]

Ordinary joins FOLLOWING the strict join stay as SQL against the
materialized strict pair.  Multiple strict joins, or a strict join whose
left side is itself a textual join chain, still raise ChSqlError pointing
at the operator API.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from byconity_spark.frontend.sql import (
    ChSqlError,
    _depth0_find,
    rewrite_ch_sql,
)

_VIEW = "__byconity_strict_join"

_TABLE_REF = r"([A-Za-z_]\w*)(?:\s+(?:AS\s+)?(?!ASOF\b|ANY\b|ON\b|USING\b)([A-Za-z_]\w*))?"
_JOIN_RE = re.compile(
    rf"\bFROM\s+{_TABLE_REF}\s+(ASOF|ANY)\s+(LEFT\s+|INNER\s+)?JOIN\s+{_TABLE_REF}\s+(ON|USING)\b",
    re.IGNORECASE,
)
_COND_RE = re.compile(
    r"^\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*(>=|<=|=|<|>)\s*"
    r"([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*$"
)
_TAIL_KEYWORDS = ("WHERE", "GROUP BY", "HAVING", "ORDER BY", "LIMIT", "SETTINGS")


def _split_depth0_and(cond: str) -> list[str]:
    parts, depth, cur, i = [], 0, [], 0
    up = cond.upper()
    while i < len(cond):
        c = cond[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if depth == 0 and up.startswith("AND", i) and (i == 0 or not cond[i - 1].isalnum()):
            nxt = i + 3
            if nxt >= len(cond) or not (cond[nxt].isalnum() or cond[nxt] == "_"):
                parts.append("".join(cur))
                cur = []
                i = nxt
                continue
        cur.append(c)
        i += 1
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _qualify_sub(text: str, mapping: dict[tuple[str, str], str], aliases: set[str]) -> str:
    """Replace alias-qualified refs per mapping; strip qualifiers of known
    aliases otherwise."""

    def repl(m: re.Match) -> str:
        q, col = m.group(1), m.group(2)
        if (q.lower(), col) in mapping:
            return mapping[(q.lower(), col)]
        if q.lower() in aliases:
            return col
        return m.group(0)

    return re.sub(r"\b([A-Za-z_]\w*)\.([A-Za-z_]\w*)\b", repl, text)


def _materialize_subquery_sides(spark: SparkSession, sql: str) -> str:
    """Subquery sides of a strict join — ``FROM (SELECT ...) a ASOF JOIN
    (SELECT ...) b`` — execute through ch_sql (recursion handles their own
    CH clauses) and register as temp views, rewriting the text to the
    named-table shape the parser handles."""
    from byconity_spark.frontend.sql import ch_sql, _match_paren, _skip_string

    out = []
    i = 0
    n = len(sql)
    view_n = 0
    while i < n:
        c = sql[i]
        if c in "'\"":
            j = _skip_string(sql, i)
            out.append(sql[i:j])
            i = j
            continue
        if c == "(":
            close = _match_paren(sql, i)
            inner = sql[i + 1 : close]
            # a subquery that is a join SIDE: preceded by FROM/JOIN keyword
            prev = "".join(out).rstrip().upper()
            is_side = prev.endswith("FROM") or prev.endswith("JOIN")
            if is_side and inner.lstrip()[:6].upper() == "SELECT":
                view_n += 1
                name = f"__strict_side_{view_n}"
                ch_sql(spark, inner).createOrReplaceTempView(name)
                out.append(name)
            else:
                out.append(sql[i : close + 1])
            i = close + 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def try_rewrite_strict_join(spark: SparkSession, sql: str) -> DataFrame | None:
    """If `sql` contains a depth-0 ASOF/ANY join, execute it via the operator
    API and return the DataFrame; None when no strict join is present."""
    if all(
        _depth0_find(sql, kw) < 0
        for kw in ("ASOF", "ANY JOIN", "ANY LEFT JOIN", "ANY INNER JOIN")
    ):
        return None
    sql = _materialize_subquery_sides(spark, sql)
    m = _JOIN_RE.search(sql)
    if not m:
        raise ChSqlError(
            "ASOF/ANY JOIN detected but not in the supported single-join "
            "named-table shape; use byconity_spark.operators.joins directly"
        )
    ltable, lalias, strictness, side, rtable, ralias, conj = m.groups()
    lalias = (lalias or ltable).lower()
    ralias = (ralias or rtable).lower()
    strictness = strictness.upper()
    how = "left" if (side or "").strip().upper() == "LEFT" else "inner"
    select_part = sql[: m.start()]
    rest = sql[m.end() :]

    # ON/USING clause runs until the first depth-0 tail keyword
    tail_at = len(rest)
    for kw in _TAIL_KEYWORDS:
        p = _depth0_find(rest, kw)
        if 0 <= p < tail_at:
            tail_at = p
    cond_text, tail = rest[:tail_at], rest[tail_at:]

    # Multi-join support: ordinary joins FOLLOWING the strict join stay as
    # SQL text — the strict pair materializes into _VIEW and the remaining
    # "JOIN t ON ..." segment re-attaches to the rewritten FROM clause.
    extra_joins = ""
    m_extra = re.search(
        r"\b(LEFT\s+|RIGHT\s+|FULL\s+|INNER\s+|CROSS\s+)?(OUTER\s+)?JOIN\b",
        cond_text,
        re.IGNORECASE,
    )
    if m_extra:
        extra_joins = cond_text[m_extra.start():]
        cond_text = cond_text[: m_extra.start()]

    left = spark.table(ltable)
    right = spark.table(rtable)

    equi: list[tuple[str, str]] = []  # (left col, right col)
    time_cond: tuple[str, str, str] | None = None  # (lcol, op, rcol)
    if conj.upper() == "USING":
        using_cols = re.findall(r"[A-Za-z_]\w*", cond_text)
        if strictness == "ASOF":
            # ClickHouse semantics: the LAST USING column is the ASOF
            # inequality (>=) column, the rest are equality keys
            if len(using_cols) < 2:
                raise ChSqlError(
                    "ASOF JOIN USING needs at least one equi key plus the "
                    "trailing inequality column"
                )
            *eq_cols, t = using_cols
            equi = [(c, c) for c in eq_cols]
            time_cond = (t, ">=", t)
        else:
            equi = [(c, c) for c in using_cols]
    else:
        for cond in _split_depth0_and(cond_text):
            cm = _COND_RE.match(cond)
            if not cm:
                raise ChSqlError(f"unsupported {strictness} JOIN condition: {cond!r}")
            q1, c1, op, q2, c2 = cm.groups()
            if q1.lower() == lalias and q2.lower() == ralias:
                lcol, rcol = c1, c2
            elif q1.lower() == ralias and q2.lower() == lalias:
                lcol, rcol = c2, c1
                op = {">=": "<=", "<=": ">=", ">": "<", "<": ">", "=": "="}[op]
            else:
                raise ChSqlError(f"condition does not reference both sides: {cond!r}")
            if op == "=":
                equi.append((lcol, rcol))
            else:
                if time_cond is not None:
                    raise ChSqlError("multiple inequality conditions in ASOF JOIN")
                time_cond = (lcol, op, rcol)

    if not equi:
        raise ChSqlError(f"{strictness} JOIN needs at least one equality condition")

    # rename right keys to the left key names so the operators' `on=` applies
    for lcol, rcol in equi:
        if rcol != lcol:
            right = right.withColumnRenamed(rcol, lcol)
    keys = [lcol for lcol, _ in equi]
    rkey_of = {rcol: lcol for lcol, rcol in equi}

    mapping: dict[tuple[str, str], str] = {}
    for lcol, rcol in equi:
        mapping[(ralias, rcol)] = lcol

    if strictness == "ASOF":
        if time_cond is None:
            raise ChSqlError("ASOF JOIN requires one inequality condition")
        left_time, op, right_time = time_cond
        direction = "backward" if op in (">=", ">") else "forward"
        exact = op in (">=", "<=")
        if right_time in rkey_of:
            raise ChSqlError("ASOF time column cannot also be a join key")
        # payload: right columns minus keys minus time; de-collide vs left
        payload = [c for c in right.columns if c not in keys and c != right_time]
        for p in payload:
            if p in left.columns:
                right = right.withColumnRenamed(p, f"{ralias}__{p}")
                mapping[(ralias, p)] = f"{ralias}__{p}"
        payload = [c for c in right.columns if c not in keys and c != right_time]
        from byconity_spark.operators.joins import asof_join

        joined = asof_join(
            left,
            right,
            on=keys,
            left_time=left_time,
            right_time=right_time,
            direction=direction,
            allow_exact_matches=exact,
            right_payload=payload,
        )
        matched_name = f"__matched_{right_time}"
        if right_time not in left.columns:
            # restore the user-visible name when it cannot collide
            joined = joined.withColumnRenamed(matched_name, right_time)
            matched_name = right_time
        mapping[(ralias, right_time)] = matched_name
        if how == "inner":
            joined = joined.filter(F.col(matched_name).isNotNull())
    else:  # ANY
        for p in [c for c in right.columns if c not in keys]:
            if p in left.columns:
                right = right.withColumnRenamed(p, f"{ralias}__{p}")
                mapping[(ralias, p)] = f"{ralias}__{p}"
        from byconity_spark.operators.joins import any_join

        joined = any_join(left, right, on=keys, how=how)

    joined.createOrReplaceTempView(_VIEW)
    aliases = {lalias, ralias, ltable.lower(), rtable.lower()}
    final_sql = (
        _qualify_sub(select_part, mapping, aliases)
        + f" FROM {_VIEW} "
        + _qualify_sub(extra_joins, mapping, aliases)
        + " "
        + _qualify_sub(tail, mapping, aliases)
    )
    return spark.sql(rewrite_ch_sql(final_sql))
