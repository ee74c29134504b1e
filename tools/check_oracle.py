#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (builder-side tool only).

Loads each Verify-produced parquet result, runs the corresponding oracle SQL
in DuckDB over the same fixture tables, and compares: schema (column name
set), row count, and exact cell values with columns sorted by name (mirrors
the driver's sort-columns-then-hash compare). Floats compared exactly first,
then with 1e-9 relative tolerance reported separately so near-misses are
visible.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> \
         [onlyCsv] [excludeCsv]
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_cell(x):
    # arrays (numpy/list) -> tuples so == is scalar and hashable
    if hasattr(x, "tolist"):
        x = x.tolist()
    if isinstance(x, (list, tuple)):
        return tuple(to_cell(v) for v in x)
    return x


def norm(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(to_cell(c) for c in r)
            for r in df.itertuples(index=False, name=None)]
    dtypes = [str(df[c].dtype) for c in cols]
    return cols, rows, dtypes


def is_null(x):
    try:
        import pandas as pd
        v = pd.isna(x)
        return bool(v) if isinstance(v, bool) else False
    except (TypeError, ValueError):
        return False


def cell_eq(a, b):
    na, nb = is_null(a), is_null(b)
    if na and nb:
        return True, True
    if na != nb:
        return False, False
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return (a == b), (a == b)
        if math.isnan(fa) and math.isnan(fb):
            return True, True
        exact = fa == fb
        close = exact or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
        return exact, close
    eq = a == b
    return eq, eq


def main(sf_dir, out_dir, only=None, exclude=None):
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; Spark-written scaled-gate
        # tables (tools-side) are multi-part directories — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    if exclude:
        oracle = {k: v for k, v in oracle.items() if k not in exclude}

    n_pass = n_close = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gc, gr, gt = norm(got)
        wc, wr, wt = norm(want)
        if gc != wc:
            print(f"FAIL {name}: columns spark={gc} duckdb={wc}")
            n_fail += 1
            continue
        # The driver's hash is TYPE-sensitive (e.g. DuckDB sum(BIGINT)
        # yields HUGEINT -> pandas object, vs Spark's int64): a dtype
        # mismatch fails the driver even when every value is identical.
        if gt != wt:
            diffs = [(c, a, b) for c, a, b in zip(gc, gt, wt) if a != b]
            print(f"FAIL {name}: dtypes differ (driver hash is typed): "
                  + ", ".join(f"{c}: spark={a} duckdb={b}"
                              for c, a, b in diffs))
            n_fail += 1
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rows spark={len(gr)} duckdb={len(wr)}")
            n_fail += 1
            continue
        exact_all, close_all = True, True
        first_diff = None
        for i, (ra, rb) in enumerate(zip(gr, wr)):
            for j, (a, b) in enumerate(zip(ra, rb)):
                exact, close = cell_eq(a, b)
                if not exact:
                    exact_all = False
                    if first_diff is None:
                        first_diff = (i, gc[j], a, b)
                if not close:
                    close_all = False
        if exact_all:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
        elif close_all:
            i, c, a, b = first_diff
            print(f"CLOSE {name}: row {i} col {c}: spark={a!r} duckdb={b!r}"
                  f" (within 1e-9 — would fail a strict hash)")
            n_close += 1
        else:
            i, c, a, b = first_diff
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} duckdb={b!r}")
            n_fail += 1
    print(f"\n{n_pass} exact-pass, {n_close} close, {n_fail} fail, "
          f"{len(oracle)} total oracled")
    return 1 if (n_fail or n_close) else 0


if __name__ == "__main__":
    # optional 3rd/4th args: comma-joined query subset / exclusions —
    # lets the scaled gate sidestep oracles whose single-node DuckDB
    # replay can't fit the box at the largest k (those get their own
    # smaller-k run instead of blocking the rest)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 and \
        sys.argv[3] else None
    exclude = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only, exclude))
