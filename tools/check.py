#!/usr/bin/env python3
"""Local correctness loop: run graft.Verify at a given SF, then compare each
query's parquet dump against its DuckDB oracle (same parquet tables).

Usage: python3 tools/check.py [sf_dir] [out_dir]

Mimics the driver's CORRECTNESS gate: column names sorted, rows sorted,
values compared with a small float tolerance.
"""
import sys, os, json, glob, math
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v


def rows_of(rel):
    cols = rel.description
    names = [c[0] for c in cols]
    order = sorted(range(len(names)), key=lambda i: names[i])
    data = rel.fetchall()
    out = [tuple(norm(r[i]) for i in order) for r in data]
    return sorted(names), sorted(out, key=lambda t: tuple(map(str, t)))


def main():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    with open(f"{OUT}/oracle_sql.json") as f:
        oracle = json.load(f)

    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        dump = f"{OUT}/{name}"
        files = glob.glob(f"{dump}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        try:
            got_names, got = rows_of(
                con.sql(f"SELECT * FROM read_parquet('{dump}/*.parquet')"))
        except Exception as e:
            results[name] = f"SPARK_READ_FAIL: {e}"
            continue
        try:
            exp_names, exp = rows_of(con.sql(sql))
        except Exception as e:
            results[name] = f"ORACLE_FAIL: {e}"
            continue
        if got_names != exp_names:
            results[name] = f"SCHEMA: spark={got_names} duck={exp_names}"
        elif len(got) != len(exp):
            results[name] = f"ROWCOUNT: spark={len(got)} duck={len(exp)}"
        elif got != exp:
            bad = next(i for i, (a, b) in enumerate(zip(got, exp)) if a != b)
            results[name] = (f"VALUES: first diff at sorted-row {bad}: "
                             f"spark={got[bad]} duck={exp[bad]}")
        else:
            results[name] = "OK"

    # queries without an oracle: rows-only check
    for dump in sorted(glob.glob(f"{OUT}/*/")):
        name = os.path.basename(dump.rstrip("/"))
        if name in oracle:
            continue
        files = glob.glob(f"{dump}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT(rows-only)"
            continue
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{dump}/*.parquet')"
        ).fetchone()[0]
        results[name] = f"ROWS_ONLY: {n}" if n > 0 else "ROWS_ONLY_EMPTY"

    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in results.items():
        flag = "PASS" if v == "OK" else (
            "rows" if v.startswith("ROWS_ONLY:") else "FAIL")
        print(f"[{flag}] {k}: {v}")
    print(f"\n{ok}/{len([k for k in results if k in oracle])} oracle-checked "
          f"queries OK ({len(results)} total)")


if __name__ == "__main__":
    main()
