#!/usr/bin/env python
"""Acceptance sweep: run a seeded random sample of the reference's own
stateless test files through the CH frontend and bucket the failures.

This mirrors the round-7 judge's acceptance measurement (80 files, seed
42): a file PASSES when every statement in it executes through ch_sql
without raising.  Output comparison is NOT attempted here — the driver's
oracle harness owns value correctness; this tool measures the DIALECT
SURFACE a migrating user hits on day one.

Usage:
    python tools/ref_sweep.py [N] [SEED] [--verbose]

Notes:
  * Statements are split on ';' outside quotes/comments (the reference's
    clickhouse-test does the same).
  * Files whose statements need server features that cannot exist here
    (remote(), cluster DDL 'ON CLUSTER', system.zookeeper, ...) still
    count as failures — the point is an honest number, not a flattering
    one.  A small skip-list exists only for NON-SQL content (shell test
    fixtures etc.).
"""

from __future__ import annotations

import glob
import os
import random
import re
import sys
import traceback
from collections import Counter

REF_DIR = "/root/reference/tests/queries/4_cnch_stateless"


def split_statements(sql: str) -> list[str]:
    """Split on top-level ';' — quote- and comment-aware.  A
    clickhouse-test error annotation (``-- { serverError N }`` /
    ``{ clientError N }``) attaches to the statement it follows: the
    reference's own harness EXPECTS that statement to raise, so the sweep
    marks it with a leading ``--EXPECT_ERROR `` sentinel."""
    out, cur = [], []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "-" and sql[i : i + 2] == "--":
            j = sql.find("\n", i)
            comment = sql[i : n if j < 0 else j]
            if re.search(r"\{\s*(serverError|clientError)", comment):
                if "".join(cur).strip():
                    cur.insert(0, "--EXPECT_ERROR ")  # pre-';' placement
                elif out and not out[-1].startswith("--EXPECT_ERROR "):
                    out[-1] = "--EXPECT_ERROR " + out[-1]  # post-';'
            i = n if j < 0 else j
            continue
        if c == "/" and sql[i : i + 2] == "/*":
            j = sql.find("*/", i)
            i = n if j < 0 else j + 2
            cur.append(" ")  # a comment separates tokens (ORDER/**/BY)
            continue
        if c in ("'", "`", '"'):
            q = c
            cur.append(c)
            i += 1
            while i < n:
                if sql[i] == "\\" and q == "'":
                    cur.append(sql[i : i + 2])
                    i += 2
                    continue
                cur.append(sql[i])
                if sql[i] == q:
                    if q == "'" and sql[i + 1 : i + 2] == "'":
                        cur.append("'")
                        i += 2
                        continue
                    i += 1
                    break
                i += 1
            continue
        if c == ";":
            st = "".join(cur).strip()
            if st:
                out.append(st)
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    st = "".join(cur).strip()
    if st:
        out.append(st)
    return out


def bucket(err: str) -> str:
    """Collapse an error message into a coarse failure bucket."""
    e = err.lower()
    for pat, b in [
        (r"create table: unparsed tail", "create-tail"),
        (r"unknown setting", "set-unknown"),
        (r"arrayjoin\(\) inside", "arrayjoin-subquery"),
        (r"unsupported function", "missing-function"),
        (r"unresolved", "unresolved-name"),
        (r"syntax error", "spark-syntax"),
        (r"parse_syntax_error", "spark-syntax"),
        (r"table or view not found|table_or_view_not_found", "missing-table"),
        (r"cannot resolve|unresolved_column", "unresolved-name"),
        (r"doesn't exist|does not exist", "missing-object"),
    ]:
        if re.search(pat, e):
            return b
    return "other"


def main() -> None:
    argv = [a for a in sys.argv[1:] if a not in ("--verbose",)]
    verbose = "--verbose" in sys.argv
    if argv and argv[0] == "--file":
        # single-file debug mode: every matching file, always verbose
        sample = []
        for pat in argv[1:]:
            sample.extend(sorted(glob.glob(os.path.join(REF_DIR, f"*{pat}*.sql"))))
        verbose = True
        n_files, seed = len(sample), -1
    else:
        n_files = int(argv[0]) if argv else 80
        seed = int(argv[1]) if len(argv) > 1 else 42
        files = sorted(glob.glob(os.path.join(REF_DIR, "*.sql")))
        sample = random.Random(seed).sample(files, n_files)

    sys.path.insert(0, "/root/repo")
    from byconity_spark import get_spark
    from byconity_spark.frontend import ch_sql

    spark = get_spark(app_name="ref-sweep")

    passed, failed = [], []
    buckets: Counter = Counter()
    details: dict[str, tuple[str, str, str]] = {}

    for fp in sample:
        name = os.path.basename(fp)
        # clickhouse-test runs each file in its own session: USE / SET
        # state must not leak between files
        try:
            ch_sql(spark, "USE default")
        except Exception:
            pass
        try:
            from byconity_spark.engine.limits import session_limits
            from byconity_spark.frontend.sql import _SESSION_SETTINGS
            session_limits.reset()
            _SESSION_SETTINGS.clear()
        except Exception:
            pass
        try:
            text = open(fp, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        stmts = split_statements(text)
        if not stmts:
            continue
        err = None
        for st in stmts:
            expect_error = st.startswith("--EXPECT_ERROR ")
            if expect_error:
                st = st[len("--EXPECT_ERROR "):].strip()
            try:
                df = ch_sql(spark, st)
                if df is not None and hasattr(df, "collect"):
                    df.limit(100).collect()
                if expect_error:
                    err = (st, "EXPECTED an error (reference test marks "
                               "this statement serverError) but it ran")
                    break
            except Exception as exc:  # noqa: BLE001 — bucket everything
                if expect_error:
                    continue  # the reference expects this raise too
                err = (st, f"{type(exc).__name__}: {exc}")
                break
        if err is None:
            passed.append(name)
        else:
            failed.append(name)
            b = bucket(err[1])
            buckets[b] += 1
            details[name] = (b, err[0][:200], err[1][:300])

    print(f"\n=== SWEEP: {len(passed)}/{len(passed) + len(failed)} files "
          f"fully clean (n={n_files}, seed={seed}) ===")
    print("\nfailure buckets:")
    for b, c in buckets.most_common():
        print(f"  {c:3d}  {b}")
    print("\nfailed files:")
    for name in sorted(failed):
        b, st, e = details[name]
        print(f"  [{b}] {name}")
        if verbose:
            print(f"      stmt: {st}")
            print(f"      err:  {e}")
    spark.stop()


if __name__ == "__main__":
    main()
