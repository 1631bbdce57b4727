"""Fuzz the CH-SQL rewriter: on inputs containing no rule names it must be
the identity, and on arbitrary balanced inputs it must never crash or
corrupt string literals."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from byconity_spark.frontend import rewrite_ch_sql
from byconity_spark.frontend.sql import PARAMETRIC, RULES

_safe_ident = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=8
).filter(lambda s: s not in RULES and s not in PARAMETRIC)

_fragment = st.one_of(
    _safe_ident,
    st.sampled_from([" ", ", ", " = ", " > ", "SELECT ", " FROM ", "(", ")", "1", "*"]),
    st.text(alphabet="abc XY1%_.", max_size=6).map(lambda s: "'" + s.replace("'", "") + "'"),
)


def _balanced(sql: str) -> bool:
    depth = 0
    in_q: str | None = None
    for ch_ in sql:
        if in_q:
            if ch_ == in_q:
                in_q = None
            continue
        if ch_ in "'\"":
            in_q = ch_
        elif ch_ == "(":
            depth += 1
        elif ch_ == ")":
            depth -= 1
            if depth < 0:
                return False
    return depth == 0 and in_q is None


@settings(max_examples=500, deadline=None)
@given(parts=st.lists(_fragment, max_size=25))
def test_rewriter_identity_without_rule_names(parts):
    sql = "".join(parts)
    if not _balanced(sql):
        return
    import re

    segs = sql.split("'")
    if any(
        re.search(r"(?<![\w.])\d\w*[A-Za-z_]", segs[i])
        for i in range(0, len(segs), 2)
    ):
        # digit-leading identifiers (1_x) are NORMALIZED (backticked) by
        # design since round 8 — identity doesn't hold for them
        return
    if re.match(r"(?is)^\s*SELECT\s+\*\s*(WHERE\b|$)", sql):
        # FROM-less `SELECT *` is INTENTIONALLY rewritten to read
        # system.one (dummy = 0) like the reference — identity is
        # scoped to FROM-bearing statements
        return
    assert rewrite_ch_sql(sql) == sql


@settings(max_examples=300, deadline=None)
@given(
    fn=st.sampled_from(["toYear", "uniq", "countIf", "lower"]),
    ident=_safe_ident,
    lit=st.text(alphabet="abc toYear(x)", max_size=12).map(
        lambda s: "'" + s.replace("'", "") + "'"
    ),
)
def test_rewriter_preserves_string_literals(fn, ident, lit):
    sql = f"SELECT {fn}({ident}), {lit} FROM t"
    out = rewrite_ch_sql(sql)
    assert lit in out  # literals pass through byte-identical
    assert out.endswith(" FROM t")


# ------------------------- round-3 clause-interaction edge cases (pinned)

def test_with_fill_plus_limit_by_order():
    """WITH FILL consumes the ORDER BY; a following LIMIT n BY k must still
    be rewritten (it lands in the preserved tail)."""
    from byconity_spark.frontend.sql import rewrite_ch_sql

    out = rewrite_ch_sql(
        "SELECT g, k, v FROM t ORDER BY g, k WITH FILL LIMIT 2 BY g"
    )
    assert "WITH FILL" not in out.upper()
    assert "row_number() OVER (PARTITION BY g" in out


def test_with_fill_inside_subquery_rewrites():
    """WITH FILL applies at any query depth (recursive scan, matching the
    LIMIT BY recursion)."""
    from byconity_spark.frontend.sql import rewrite_ch_sql

    sql = "SELECT * FROM (SELECT k FROM t ORDER BY k WITH FILL) sub"
    out = rewrite_ch_sql(sql)
    assert "WITH FILL" not in out.upper()
    # r11: type-generic counted spine (01614 float fill keys)
    assert "explode(transform(sequence(0, " in out
    assert "__k * (1)" in out


def test_interpolate_after_fill_with_limit():
    from byconity_spark.frontend.sql import rewrite_ch_sql

    out = rewrite_ch_sql(
        "SELECT k, v FROM t ORDER BY k WITH FILL INTERPOLATE (v) LIMIT 5"
    )
    assert "last(v, true) OVER" in out
    assert out.rstrip().endswith("LIMIT 5")
