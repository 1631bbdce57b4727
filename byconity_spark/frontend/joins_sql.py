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
materialized strict pair.  A strict join whose LEFT side is itself a
textual join chain materializes the chain (``SELECT * FROM <chain>``)
into a temp view first — column names must be unambiguous after
flattening (TPC-H-style prefixed columns are).  MULTIPLE strict joins in
one query resolve recursively: each pass materializes the first strict
pair and re-enters on the rewritten text.
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
    rf"\bFROM\s+{_TABLE_REF}\s+(ASOF|ANY)\s+(LEFT\s+|RIGHT\s+|INNER\s+)?JOIN\s+{_TABLE_REF}\s+(ON|USING)\b",
    re.IGNORECASE,
)
_STRICT_HEAD_RE = re.compile(
    rf"(ASOF|ANY)\s+(LEFT\s+|RIGHT\s+|INNER\s+)?JOIN\s+{_TABLE_REF}\s+(ON|USING)\b",
    re.IGNORECASE,
)
_LEFT_ALIAS_RE = re.compile(
    r"\b(?:FROM|JOIN)\s+([A-Za-z_]\w*)"
    r"(?:\s+(?:AS\s+)?(?!ON\b|USING\b|LEFT\b|RIGHT\b|INNER\b|FULL\b|CROSS\b"
    r"|JOIN\b|ASOF\b|ANY\b|WHERE\b|GROUP\b|ORDER\b|LIMIT\b)([A-Za-z_]\w*))?",
    re.IGNORECASE,
)
_COND_RE = re.compile(
    r"^\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*(>=|<=|=|<|>)\s*"
    r"([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*$"
)
_TAIL_KEYWORDS = ("WHERE", "GROUP BY", "HAVING", "ORDER BY", "LIMIT", "SETTINGS")


def _split_depth0_eq(cond: str):
    """Split one conjunct at its single top-level ``=`` (expression
    join keys); None when there isn't exactly one."""
    depth, pos = 0, []
    i, n = 0, len(cond)
    while i < n:
        c = cond[i]
        if c == "'":
            i += 1
            while i < n and cond[i] != "'":
                i += 1
        elif c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif depth == 0 and c == "=" and cond[i - 1:i] not in (
            "<", ">", "!"
        ) and cond[i + 1:i + 2] != "=":
            pos.append(i)
        i += 1
    if len(pos) != 1:
        return None
    return cond[:pos[0]].strip(), cond[pos[0] + 1:].strip()


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


def _qualify_sub(
    text: str,
    mapping: dict[tuple[str, str], str],
    aliases: set[str],
    qual: str | None = None,
) -> str:
    """Replace alias-qualified refs per mapping; re-qualify references to
    known aliases with `qual` (the materialized view) so a later strict
    join in the same query can still parse two-sided conditions; strip
    when no qual is given."""

    def repl(m: re.Match) -> str:
        q, col = m.group(1), m.group(2)
        if (q.lower(), col) in mapping:
            new = mapping[(q.lower(), col)]
            return f"{qual}.{new}" if qual else new
        if q.lower() in aliases:
            return f"{qual}.{col}" if qual else col
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


def _depth0_regex(sql: str, regex: re.Pattern) -> re.Match | None:
    """First regex match at paren depth 0 (outside string literals)."""
    for m in regex.finditer(sql):
        depth = 0
        i = 0
        while i < m.start():
            c = sql[i]
            if c in "'\"":
                i = _skip_str(sql, i)
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            i += 1
        if depth == 0 and i == m.start():
            return m
    return None


def _skip_str(sql: str, i: int) -> int:
    from byconity_spark.frontend.sql import _skip_string

    return _skip_string(sql, i)


def try_rewrite_strict_join(
    spark: SparkSession, sql: str, _depth: int = 0
) -> DataFrame | None:
    """If `sql` contains a depth-0 ASOF/ANY join, execute it via the operator
    API and return the DataFrame; None when no strict join is present.
    Left-side join CHAINS materialize through ch_sql first; several strict
    joins in one query resolve by recursion on the rewritten text."""
    if all(
        _depth0_find(sql, kw) < 0
        for kw in ("ASOF", "ANY JOIN", "ANY LEFT JOIN", "ANY INNER JOIN",
                   "ANY RIGHT JOIN")
    ):
        return None
    if _depth > 8:
        raise ChSqlError("strict-join recursion limit exceeded")
    # GLOBAL is a distribution modifier (broadcast the right side to every
    # shard — ASTTablesInSelectQuery.h locality); single-engine semantics
    # are identical, so it strips before the strict-join parse
    sql = re.sub(r"(?i)\bGLOBAL\s+(?=(?:ASOF|ANY)\b)", "", sql)
    sql = _materialize_subquery_sides(spark, sql)
    chain_left = False
    m = _JOIN_RE.search(sql)
    if m:
        ltable, lalias, strictness, side, rtable, ralias, conj = m.groups()
        left_aliases = {ltable.lower(), (lalias or ltable).lower()}
    else:
        # LEFT side is a textual join chain: FROM a JOIN b ... ASOF JOIN c.
        # Materialize the chain via ch_sql and re-anchor on the view.
        sm = _depth0_regex(sql, _STRICT_HEAD_RE)
        from_at = -1
        p = _depth0_find(sql, "FROM")
        while 0 <= p < (sm.start() if sm else -1):
            from_at = p
            p = _depth0_find(sql, "FROM", p + 4)
        if sm is None or from_at < 0:
            raise ChSqlError(
                "ASOF/ANY JOIN detected but not in a supported shape; use "
                "byconity_spark.operators.joins directly"
            )
        left_spec = sql[from_at + 4 : sm.start()].strip()
        if _depth0_find(left_spec, "JOIN") < 0:
            raise ChSqlError(
                f"unsupported strict-join left side: {left_spec!r}"
            )
        from byconity_spark.frontend.sql import ch_sql

        lview = f"__strict_left_{_depth}"
        chain_df = ch_sql(spark, "SELECT * FROM " + left_spec)
        # SELECT * over an equi-join flattens BOTH key columns under one
        # name; suffix later duplicates so references resolve to the first
        names: list[str] = []
        seen: dict[str, int] = {}
        for c in chain_df.columns:
            if c in seen:
                seen[c] += 1
                names.append(f"{c}__dup{seen[c]}")
            else:
                seen[c] = 0
                names.append(c)
        if len(names) != len(set(chain_df.columns)):
            chain_df = chain_df.toDF(*names)
        chain_df.createOrReplaceTempView(lview)
        left_aliases = set()
        for am in _LEFT_ALIAS_RE.finditer("FROM " + left_spec):
            left_aliases.add(am.group(1).lower())
            if am.group(2):
                left_aliases.add(am.group(2).lower())
        chain_left = True
        ltable, lalias = lview, lview
        strictness, side, rtable, ralias, conj = (
            sm.group(1), sm.group(2), sm.group(3), sm.group(4), sm.group(5)
        )
        m = sm
        select_part = sql[:from_at] + " "
    if not chain_left:
        select_part = sql[: m.start()]
    lalias = (lalias or ltable).lower()
    ralias = (ralias or rtable).lower()
    strictness = strictness.upper()
    side_u = (side or "").strip().upper()
    how = {"LEFT": "left", "RIGHT": "right"}.get(side_u, "inner")
    if strictness == "ASOF" and how == "right":
        raise ChSqlError("ASOF RIGHT JOIN is not supported (reference "
                         "allows ASOF [LEFT|INNER] only)")
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
        r"\b(ASOF\s+|ANY\s+)?(LEFT\s+|RIGHT\s+|FULL\s+|INNER\s+|CROSS\s+)?"
        r"(OUTER\s+)?JOIN\b",
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
    synthetic_keys: list[str] = []
    if conj.upper() != "USING":
        for cond in _split_depth0_and(cond_text):
            cm = _COND_RE.match(cond)
            if not cm:
                # expression equality (00703 `tab1.b1 + 3 = tab1_copy.b1
                # + 2`): evaluate each side on its own relation as a
                # synthetic key column, then equi-join on those
                eq = _split_depth0_eq(cond)
                if eq is not None and strictness == "ANY":
                    e1, e2 = eq
                    q1s = {q.lower() for q in
                           re.findall(r"([A-Za-z_]\w*)\.\w+", e1)}
                    q2s = {q.lower() for q in
                           re.findall(r"([A-Za-z_]\w*)\.\w+", e2)}
                    if q1s == {lalias} and q2s == {ralias}:
                        le, re_ = e1, e2
                    elif q1s == {ralias} and q2s == {lalias}:
                        le, re_ = e2, e1
                    else:
                        raise ChSqlError(
                            f"condition does not reference both sides: "
                            f"{cond!r}"
                        )
                    syn = f"__je{len(equi)}"
                    strip_l = re.sub(
                        rf"(?i)\b{re.escape(lalias)}\.", "", le)
                    strip_r = re.sub(
                        rf"(?i)\b{re.escape(ralias)}\.", "", re_)
                    left = left.withColumn(syn, F.expr(strip_l))
                    right = right.withColumn(syn, F.expr(strip_r))
                    equi.append((syn, syn))
                    synthetic_keys.append(syn)
                    continue
                raise ChSqlError(f"unsupported {strictness} JOIN condition: {cond!r}")
            q1, c1, op, q2, c2 = cm.groups()
            l_ok = (
                (lambda q: q != ralias and (not left_aliases or q in left_aliases or chain_left))
                if chain_left
                else (lambda q: q == lalias)
            )
            if l_ok(q1.lower()) and q2.lower() == ralias:
                lcol, rcol = c1, c2
            elif q1.lower() == ralias and l_ok(q2.lower()):
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

    mapping: dict[tuple[str, str], str] = {}
    dup_on_keys = conj.upper() != "USING" and strictness != "ASOF"
    if dup_on_keys:
        # the ON form keeps BOTH key columns in the output (CH SELECT *
        # over `t1 JOIN t2 ON t1.x = t2.x` shows t1.x AND t2.x — 00916;
        # an unmatched outer row shows NULL for the other side's key).
        # The merged key carries the KEPT side's value, so the copy is
        # taken from the other side before the merge-rename below.
        from pyspark.sql import functions as _F
        if how == "right":
            for lcol, _rcol in equi:
                if lcol in synthetic_keys:
                    continue  # expression keys are internal, not output
                cpy = f"{lalias}__{lcol}__k"
                left = left.withColumn(cpy, _F.col(lcol))
                mapping[(lalias, lcol)] = cpy
        else:
            for _lcol, rcol in equi:
                if rcol in synthetic_keys:
                    continue
                cpy = f"{ralias}__{rcol}__k"
                right = right.withColumn(cpy, _F.col(rcol))
                mapping[(ralias, rcol)] = cpy
    # rename right keys to the left key names so the operators' `on=` applies
    for lcol, rcol in equi:
        if rcol != lcol:
            right = right.withColumnRenamed(rcol, lcol)
    keys = [lcol for lcol, _ in equi]
    rkey_of = {rcol: lcol for lcol, rcol in equi}

    for lcol, rcol in equi:
        mapping.setdefault((ralias, rcol), lcol)

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
        a_left, a_right, a_ralias, a_how = left, right, ralias, how
        if how == "right":
            # CH ANY RIGHT JOIN keeps every RIGHT row with at most one
            # LEFT match — the mirror of ANY LEFT with the sides swapped
            # (ASTTablesInSelectQuery.h:127 strictness binds to the other
            # side)
            a_left, a_right, a_ralias, a_how = right, left, lalias, "left"
        for p in [c for c in a_right.columns if c not in keys]:
            if p in a_left.columns:
                a_right = a_right.withColumnRenamed(p, f"{a_ralias}__{p}")
                mapping[(a_ralias, p)] = f"{a_ralias}__{p}"
        from byconity_spark.operators.joins import any_join

        joined = any_join(a_left, a_right, on=keys, how=a_how)
        if how == "right" and dup_on_keys:
            # SELECT * order: the left table's columns come first in CH
            front = [
                f"{lalias}__{lcol}__k" for lcol, _ in equi
                if f"{lalias}__{lcol}__k" in joined.columns
            ]
            rest = [c for c in joined.columns if c not in front]
            joined = joined.select(*front, *rest)

    if synthetic_keys:
        joined = joined.drop(*synthetic_keys)
    view = f"{_VIEW}_{_depth}"
    joined.createOrReplaceTempView(view)
    aliases = {lalias, ralias, ltable.lower(), rtable.lower()} | left_aliases
    final_sql = (
        _qualify_sub(select_part, mapping, aliases, view)
        + f" FROM {view} "
        + _qualify_sub(extra_joins, mapping, aliases, view)
        + " "
        + _qualify_sub(tail, mapping, aliases, view)
    )
    # another strict join further down the chain? resolve it recursively
    if any(
        _depth0_find(final_sql, kw) >= 0
        for kw in ("ASOF", "ANY JOIN", "ANY LEFT JOIN", "ANY INNER JOIN",
                   "ANY RIGHT JOIN")
    ):
        out = try_rewrite_strict_join(spark, final_sql, _depth + 1)
        if out is not None:
            return out
    return spark.sql(rewrite_ch_sql(final_sql))
