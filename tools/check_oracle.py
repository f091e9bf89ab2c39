"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB against the same parquet tables, then compares row counts,
column names, and values (columns sorted by name, rows sorted by all
columns — the driver's order-insensitive hash). Floats must agree to
1e-6 relative; exact mismatches that survive rounding are reported so
queries can be hardened before the real gate runs.

Usage: python tools/check_oracle.py [--sf DIR] [name ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from data_observability_installer_spark.session import get_spark  # noqa: E402
from data_observability_installer_spark.sources.tables import TABLES  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df):
    """pandas DF -> sorted-list-of-rows with columns sorted by name."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append(None)
            elif isinstance(v, float):
                row.append(v)
            else:
                row.append(v)
        rows.append(tuple(row))
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


def values_match(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        return math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-9)
    return str(a) == str(b)


def compare(name: str, spark_df, sql: str, con) -> list[str]:
    issues: list[str] = []
    sp = spark_df.toPandas()
    du = con.execute(sql).fetchdf()
    sp_cols, sp_rows = normalize(sp)
    du_cols, du_rows = normalize(du)
    if sp_cols != du_cols:
        issues.append(f"schema mismatch: spark={sp_cols} duckdb={du_cols}")
        return issues
    if len(sp_rows) != len(du_rows):
        issues.append(f"row count mismatch: spark={len(sp_rows)} duckdb={len(du_rows)}")
        return issues
    exact = 0
    for i, (r1, r2) in enumerate(zip(sp_rows, du_rows)):
        for c, (v1, v2) in zip(sp_cols, zip(r1, r2)):
            if not values_match(v1, v2):
                issues.append(f"row {i} col {c}: spark={v1!r} duckdb={v2!r}")
                if len(issues) > 5:
                    return issues
            elif str(v1) != str(v2):
                exact += 1
    if exact:
        issues.append(f"NOTE: {exact} values close-but-not-exact (hash gate may flag)")
    return issues


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("oracle-check", cpus=8)
    con = duck_con(args.sf)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or sorted(qs)
    failed = 0
    for name in names:
        if name not in oracles:
            print(f"SKIP  {name} (no oracle; rows-only)")
            n = qs[name](spark, args.sf).count()
            print(f"      rows={n}")
            continue
        try:
            issues = compare(name, qs[name](spark, args.sf), oracles[name], con)
        except Exception as e:  # surface, keep checking the rest
            issues = [f"EXCEPTION: {type(e).__name__}: {e}"]
        status = "OK  " if not issues else ("warn" if all(s.startswith("NOTE") for s in issues) else "FAIL")
        if status == "FAIL":
            failed += 1
        print(f"{status}  {name}")
        for s in issues:
            print(f"      {s}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
