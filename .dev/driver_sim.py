"""Driver simulation: run entry() + every queries() entry at sf0.01 and
compare against oracle_sql() via DuckDB.

Mirrors the real driver's t2 check: columns sorted by name, rows
order-insensitive, floats rounded to 9 significant digits — and DTYPE-STRICT
(post-canon exact string compare tagged with the value's type class, no
numeric coercion: int 2674 vs float 2674.0 FAILS, like the driver's pandas
value-hash). Midnight timestamps canonicalize to dates (the driver's value
canon does the same).

Usage: python .dev/driver_sim.py [only_name ...]
Env:   SIM_SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon_value(v):
    """Canonical (type-tagged) string for one cell — dtype-strict."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, int):
        return f"int:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "float:NaN"
        if v == 0:
            return "float:0.0"
        return f"float:{float(f'{v:.9g}')!r}"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            f = float(v)
            if math.isnan(f):
                return "float:NaN"
            if f == 0:
                return "float:0.0"
            return f"float:{float(f'{f:.9g}')!r}"
    except Exception:
        pass
    if isinstance(v, datetime):
        v = v.replace(tzinfo=None)
        if v.hour == v.minute == v.second == v.microsecond == 0:
            return f"date:{v.date().isoformat()}"
        return f"ts:{v.isoformat()}"
    if isinstance(v, date):
        return f"date:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}={_canon_value(x)}" for k, x in sorted(v.items(), key=lambda kv: str(kv[0]))
        ) + "}"
    if isinstance(v, (bytes, bytearray)):
        return f"bytes:{bytes(v).hex()}"
    return f"str:{v}" if isinstance(v, str) else f"{type(v).__name__}:{v}"


def canonicalize(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(row[i]) for i in order) for row in rows]
    out.sort()
    return [columns[i] for i in order], out


def main() -> int:
    only = set(sys.argv[1:])

    import __spark_entry__ as mod
    from byconity_spark import get_spark

    spark = get_spark(app_name="driver-sim")

    t0 = time.time()
    n = mod.entry(spark).count()
    print(f"[t1] entry() -> {n} rows in {time.time() - t0:.1f}s", flush=True)

    qs = mod.queries()
    oracles = mod.oracle_sql()

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )

    match = rows_only = fails = errs = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            errs += 1
            print(f"[t2] {name}: ERR building/collecting: {type(e).__name__}: {e}", flush=True)
            continue
        dt = time.time() - t0
        oracle = oracles.get(name)
        if oracle is None:
            rows_only += 1
            print(f"[t2] {name}: ROWS-ONLY ({len(s_rows)} rows, {dt:.1f}s)", flush=True)
            continue
        try:
            rel = con.sql(oracle)
            d_cols = list(rel.columns)
            d_rows = rel.fetchall()
        except Exception as e:
            errs += 1
            print(f"[t2] {name}: ERR oracle: {type(e).__name__}: {e}", flush=True)
            continue
        if sorted(s_cols) != sorted(d_cols):
            fails += 1
            print(
                f"[t2] {name}: FAIL columns spark={sorted(s_cols)} duck={sorted(d_cols)}",
                flush=True,
            )
            continue
        _, s_canon = canonicalize(s_cols, s_rows)
        _, d_canon = canonicalize(d_cols, d_rows)
        if len(s_canon) != len(d_canon):
            fails += 1
            print(
                f"[t2] {name}: FAIL rowcount spark={len(s_canon)} duck={len(d_canon)}",
                flush=True,
            )
            continue
        bad = None
        for i, (a, b) in enumerate(zip(s_canon, d_canon)):
            if a != b:
                bad = (i, a, b)
                break
        if bad is not None:
            fails += 1
            i, a, b = bad
            print(f"[t2] {name}: FAIL row {i}\n  spark={a}\n  duck ={b}", flush=True)
            continue
        match += 1
        print(f"[t2] {name}: MATCH ({dt:.1f}s)", flush=True)

    print(
        f"[sim] MATCH: {match}  ROWS-ONLY: {rows_only}  FAILS: {fails}  ERRS: {errs}",
        flush=True,
    )
    spark.stop()
    return 0 if fails == 0 and errs == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
