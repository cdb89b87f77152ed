#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage:
    sbt -batch 'runMain graft.Verify /root/testdata/sf0.01 target/verify_local [q1,q2]'
    python3 tools/oracle_compare.py /root/testdata/sf0.01 target/verify_local [q1,q2]

For every query dumped by graft.Verify it runs the matching
SparkEntry.oracleSql in DuckDB over the same parquet tables and compares:
columns sorted by name, rows sorted by all columns, values string-compared
(the driver hashes the same canonicalization). Queries without an oracle
entry are reported as rows-only, like the driver does. Exit code = number
of mismatching queries.

Driver-side tooling only (python/duckdb are not library dependencies).
"""
import json
import os
import sys

import duckdb


def canon(df):
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        df[c] = df[c].map(lambda v: "null" if v is None else str(v))
    df = df.sort_values(by=cols).reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    con = duckdb.connect()
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet"):
            t = f[: -len(".parquet")]
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{f}/*.parquet')"
                if os.path.isdir(os.path.join(sf_dir, f))
                else f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{f}')"
            )

    with open(os.path.join(out_dir, "oracle_sql.json")) as fh:
        oracles = json.load(fh)
    err_path = os.path.join(out_dir, "verify_errors.json")
    verify_errors = {}
    if os.path.exists(err_path):
        with open(err_path) as fh:
            verify_errors = json.load(fh)

    names = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)) and (only is None or d in only)
    )
    n_pass, n_rows_only, failures = 0, 0, []
    for name in names:
        if name in verify_errors:
            failures.append((name, "verify error: " + verify_errors[name][:200]))
            continue
        got = con.execute(
            f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')"
        ).fetchdf()
        if name not in oracles:
            if len(got) > 0:
                n_rows_only += 1
            else:
                failures.append((name, "rows-only check: 0 rows"))
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001 - report, don't crash the sweep
            failures.append((name, f"oracle SQL error: {e}"))
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            failures.append((name, f"schema: spark={list(g.columns)} oracle={list(e.columns)}"))
        elif len(g) != len(e):
            failures.append((name, f"rows: spark={len(g)} oracle={len(e)}"))
        elif not g.equals(e):
            diff = (g != e).any(axis=1)
            i = diff[diff].index[0]
            failures.append(
                (name, f"values differ at row {i}: spark={g.loc[i].to_dict()} oracle={e.loc[i].to_dict()}")
            )
        else:
            n_pass += 1

    print(f"compared={len(names)} pass={n_pass} rows_only={n_rows_only} fail={len(failures)}")
    for name, why in failures:
        print(f"FAIL {name}: {why}")
    sys.exit(min(len(failures), 120))


if __name__ == "__main__":
    main()
