"""MergeTree PROJECTIONs with automatic aggregate query rewrite.

Reference: projections are per-part pre-aggregations declared with
``ALTER TABLE t ADD PROJECTION p (SELECT dims..., aggs... GROUP BY
dims...)`` (src/Parsers/ASTProjectionDeclaration.h,
src/Storages/ProjectionsDescription.h) and used transparently by the
optimizer when an aggregate query matches
(src/Processors/QueryPlan/Optimizations/optimizeUseAggregateProjection.cpp,
and the broader rewrite in src/Optimizer/Rewriter/MaterializedViewRewriter.h).

Spark mapping: a projection is a materialized rollup parquet keyed by the
source table's version (engine/query_cache.table_version — bumped by every
session write).  ``try_rewrite`` matches simple aggregate statements
(``SELECT dims, aggs FROM t [WHERE dim-only cond] GROUP BY dims``) whose
dims are a subset of the projection's and whose measures it can re-derive
(sum of sums, sum of counts, min of mins, max of maxes, avg from
sum+count), and answers them from the projection — re-aggregated, never
touching the fact table.  A stale projection (source version moved) is
re-materialized on first use, which is the consistency contract the
reference gets from materializing projections inside each part at INSERT
time.

Scale: the rewrite turns a fact-table scan into a scan of a rollup that is
smaller by the group-by reduction factor; at 100 TB of facts with
low-cardinality dims that is the difference between a full shuffle-agg and
reading a few MB.  The residual WHERE pushes into the projection scan.
"""

from __future__ import annotations

import re
import shutil
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

# measure kinds we can split/merge (reference
# optimizeUseAggregateProjection handles exactly the splittable aggregates)
_MERGE = {
    "sum": "sum", "count": "sum", "min": "min", "max": "max",
}


@dataclass
class Projection:
    name: str
    table: str
    dims: list
    # alias -> (kind, source-expr-normalized); avg stored as two hidden
    # measures __<alias>_sum / __<alias>_cnt
    measures: dict
    select_sql: str  # the materialization statement body
    path: str = ""
    version: int = -1
    tmpdir: str = field(default="", repr=False)


def _norm(e: str) -> str:
    return re.sub(r"\s+", "", e).lower()


class ProjectionRegistry:
    def __init__(self) -> None:
        self._by_table: dict = {}

    def clear(self) -> None:
        for projs in self._by_table.values():
            for p in projs.values():
                if p.tmpdir:
                    shutil.rmtree(p.tmpdir, ignore_errors=True)
        self._by_table.clear()

    # -- DDL ------------------------------------------------------------------

    def add(self, table: str, name: str, body: str) -> "Projection":
        """body = ``SELECT <items> GROUP BY <dims>`` from the ADD
        PROJECTION declaration (ASTProjectionDeclaration.h)."""
        if re.search(r"(?is)GROUP\s+BY.+ORDER\s+BY", body):
            # reference: an aggregate projection cannot ORDER BY
            # (ASTProjectionSelectQuery — ILLEGAL_PROJECTION)
            raise ValueError(
                "ILLEGAL_PROJECTION (583): an aggregate projection "
                "cannot have ORDER BY after GROUP BY"
            )
        # a NORMAL projection (no aggregation) is a sort-order hint:
        # `select x, y order by x` — accepted as metadata, no rollup
        nm = re.match(
            r"(?is)^\s*SELECT\s+([\w,.`\s]+?)\s+ORDER\s+BY\s+[\w,.`\s]+$",
            body,
        )
        if nm and not re.search(r"(?i)GROUP\s+BY|\(", body):
            dims_n = [c.strip() for c in nm.group(1).split(",")]
            proj = Projection(
                name=name, table=table, dims=dims_n, measures={},
                select_sql=f"SELECT {', '.join(dims_n)} FROM {table}",
            )
            self._by_table.setdefault(table, {})[name] = proj
            return proj
        m = re.match(
            r"(?is)^\s*SELECT\s+(.+?)(?:\s+GROUP\s+BY\s+(.+?))?\s*$",
            body,
        )
        if not m:
            raise ValueError(
                "ADD PROJECTION: body must be "
                "'SELECT <dims and aggregates> [GROUP BY <dims>]'"
            )
        items, group_by = m.groups()
        dims = (
            [c.strip() for c in _split_commas(group_by)]
            if group_by else []
        )
        measures: dict = {}
        select_parts = [*dims]
        for item in _split_commas(items):
            item = item.strip()
            if item in dims:
                continue
            am = re.match(
                r"(?is)^(sum|count|min|max|avg)\s*\((.*)\)"
                r"(?:\s+AS\s+([A-Za-z_]\w*))?$",
                item,
            )
            if not am:
                raise ValueError(
                    f"ADD PROJECTION: unsupported item {item!r} (dims must "
                    "appear in GROUP BY; aggregates need one of "
                    "sum/count/min/max/avg)"
                )
            kind, expr = am.group(1).lower(), am.group(2)
            # unaliased aggregates get the reference's auto name
            alias = am.group(3) or re.sub(r"\W+", "_", item).strip("_")
            if kind == "avg":
                # avg splits into sum+count (reference does the same)
                measures[alias] = ("avg", _norm(expr))
                select_parts.append(f"sum({expr}) AS __{alias}_sum")
                select_parts.append(f"count({expr}) AS __{alias}_cnt")
            else:
                measures[alias] = (kind, _norm(expr))
                select_parts.append(f"{kind}({expr}) AS {alias}")
        proj = Projection(
            name=name,
            table=table,
            dims=dims,
            measures=measures,
            select_sql=(
                f"SELECT {', '.join(select_parts)} FROM {table}"
                + (f" GROUP BY {', '.join(dims)}" if dims else "")
            ),
        )
        self._by_table.setdefault(table, {})[name] = proj
        return proj

    def drop(self, table: str, name: str) -> bool:
        proj = self._by_table.get(table, {}).pop(name, None)
        if proj and proj.tmpdir:
            shutil.rmtree(proj.tmpdir, ignore_errors=True)
        return proj is not None

    def rows(self):
        return [
            (p.table, p.name, ",".join(p.dims), len(p.measures), p.version)
            for projs in sorted(self._by_table.items())
            for p in sorted(projs[1].values(), key=lambda x: x.name)
        ]

    # -- materialization ---------------------------------------------------------

    def _ensure_fresh(self, spark: SparkSession, proj: Projection) -> None:
        from byconity_spark.engine.query_cache import query_cache

        ver = query_cache.table_version(proj.table)
        if proj.version == ver and proj.path:
            return
        if not proj.tmpdir:
            proj.tmpdir = tempfile.mkdtemp(prefix="bspark_proj_")
            proj.path = f"{proj.tmpdir}/{proj.table}__{proj.name}"
        spark.sql(proj.select_sql).write.mode("overwrite").parquet(proj.path)
        proj.version = ver

    # -- rewrite -------------------------------------------------------------------

    def try_rewrite(self, spark: SparkSession, sql: str) -> str | None:
        """If ``sql`` is a simple aggregate over a projected table that a
        projection can answer, return the rewritten statement reading the
        (fresh) projection; else None."""
        if not self._by_table:
            return None
        m = re.match(
            r"(?is)^\s*SELECT\s+(.+?)\s+FROM\s+([A-Za-z_]\w*)\s*"
            r"(?:WHERE\s+(.+?)\s*)?GROUP\s+BY\s+([\w,\s]+?)\s*$",
            sql,
        )
        if not m:
            return None
        items, table, cond, group_by = m.groups()
        projs = self._by_table.get(table)
        if not projs:
            return None
        dims = [c.strip() for c in group_by.split(",")]
        for proj in projs.values():
            out = self._match(proj, items, dims, cond)
            if out is None:
                continue
            self._ensure_fresh(spark, proj)
            view = f"__proj_{proj.table}_{proj.name}"
            spark.read.parquet(proj.path).createOrReplaceTempView(view)
            where = f" WHERE {cond}" if cond else ""
            return (
                f"SELECT {', '.join(out)} FROM {view}{where} "
                f"GROUP BY {', '.join(dims)}"
            )
        return None

    def _match(self, proj, items: str, dims: list, cond) -> list | None:
        if not set(dims) <= set(proj.dims):
            return None
        if cond is not None:
            # the residual predicate may only reference projection dims
            # (any other column no longer exists after the rollup) —
            # string literals are stripped before the identifier scan
            bare = re.sub(r"'[^']*'", "", cond)
            idents = {
                i for i in re.findall(r"[A-Za-z_]\w*", bare)
                if i.lower() not in _SQL_WORDS
            }
            if not idents <= set(proj.dims):
                return None
        out = []
        for item in _split_commas(items):
            item = item.strip()
            dm = re.match(r"(?is)^([A-Za-z_]\w*)(?:\s+AS\s+(\w+))?$", item)
            if dm and dm.group(1) in dims:
                out.append(item)
                continue
            am = re.match(
                r"(?is)^(sum|count|min|max|avg)\s*\((.*)\)\s+AS\s+"
                r"([A-Za-z_]\w*)$",
                item,
            )
            if not am:
                return None
            kind, expr, alias = am.group(1).lower(), _norm(am.group(2)), am.group(3)
            src = next(
                (
                    a for a, (k, e) in proj.measures.items()
                    if k == kind and e == expr
                ),
                None,
            )
            if src is None:
                return None
            if kind == "avg":
                out.append(
                    f"sum(__{src}_sum) / sum(__{src}_cnt) AS {alias}"
                )
            else:
                out.append(f"{_MERGE[kind]}({src}) AS {alias}")
        return out


_SQL_WORDS = {
    "and", "or", "not", "in", "like", "between", "is", "null", "true",
    "false",
}


def _split_commas(s: str) -> list:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


projections = ProjectionRegistry()
