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

# Approximate queries without a full oracle get a quantitative gate
# instead of rows-only: the exact_* columns must EQUAL DuckDB's exact
# answer, and each approx_* column must sit within rel_tol of it.
# Currently empty: q76 moved to the normal hash path (it now emits exact
# counts + in-query tolerance booleans; the raw quantitative bound lives
# in ApproxBoundSpec). The machinery stays for the next approximate op.
BOUNDED = {}


# Outputs past this row count skip the Python fetchall compare (a 54M-row
# pair table would need ~20 GB of tuples) and compare inside DuckDB
# instead: schema by sorted column names, row count, then a multiset
# symmetric difference (EXCEPT ALL both ways) over a 6-dp-rounded
# projection. The oracle runs once into a temp table, not three times.
BIG_ROWS = 2_000_000


def norm_proj(con, src):
    cols = con.sql(f"DESCRIBE {src}").fetchall()
    parts = {}
    for name, typ, *_ in cols:
        q = '"' + name + '"'
        if typ in ("DOUBLE", "FLOAT", "REAL"):
            parts[name] = f"round(CAST({q} AS DOUBLE), 6) AS {q}"
        else:
            parts[name] = f"{q}"
    names = sorted(parts)
    return ", ".join(parts[n] for n in names), names


def check_big(con, name, dump, sql):
    spark_src = f"SELECT * FROM read_parquet('{dump}/*.parquet')"
    con.execute("DROP TABLE IF EXISTS _oracle_big")
    con.execute(f"CREATE TEMP TABLE _oracle_big AS {sql}")
    proj_s, names_s = norm_proj(con, spark_src)
    proj_o, names_o = norm_proj(con, "SELECT * FROM _oracle_big")
    if names_s != names_o:
        return f"SCHEMA: spark={names_s} duck={names_o}"
    cnt_s = con.sql(f"SELECT count(*) FROM ({spark_src})").fetchone()[0]
    cnt_o = con.sql("SELECT count(*) FROM _oracle_big").fetchone()[0]
    if cnt_s != cnt_o:
        return f"ROWCOUNT: spark={cnt_s} duck={cnt_o}"
    diff = con.sql(f"""
        SELECT count(*) FROM (
          (SELECT {proj_s} FROM ({spark_src})
           EXCEPT ALL SELECT {proj_o} FROM _oracle_big)
          UNION ALL
          (SELECT {proj_o} FROM _oracle_big
           EXCEPT ALL SELECT {proj_s} FROM ({spark_src})))""").fetchone()[0]
    con.execute("DROP TABLE IF EXISTS _oracle_big")
    return "OK" if diff == 0 else f"VALUES: {diff} multiset-diff rows"


def check_bounded(con, name, dump, spec):
    rel = con.sql(f"SELECT * FROM read_parquet('{dump}/*.parquet')")
    names = [c[0] for c in rel.description]
    rows = rel.fetchall()
    if len(rows) != 1:
        return f"BOUNDED_ROWCOUNT: expected 1 row, got {len(rows)}"
    got = dict(zip(names, rows[0]))
    exact = con.sql(spec["oracle"])
    exact_row = dict(zip([c[0] for c in exact.description],
                         exact.fetchall()[0]))
    for approx_col, exact_col, tol in spec["pairs"]:
        if exact_col not in got or approx_col not in got:
            return f"BOUNDED_SCHEMA: missing {approx_col}/{exact_col}"
        if got[exact_col] != exact_row[exact_col]:
            return (f"BOUNDED_EXACT: {exact_col} spark={got[exact_col]} "
                    f"duck={exact_row[exact_col]}")
        e = exact_row[exact_col]
        if not e:
            # A ratio tolerance is vacuous at zero: demand approx == 0.
            if got[approx_col] != 0:
                return (f"BOUNDED_ERROR: {approx_col}={got[approx_col]} "
                        f"but {exact_col}=0")
            continue
        err = abs(got[approx_col] - e) / e
        if err > tol:
            return (f"BOUNDED_ERROR: {approx_col}={got[approx_col]} vs "
                    f"{exact_col}={e} rel_err={err:.4f} > {tol}")
    return "OK_BOUNDED"


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

    # Queries that threw inside graft.Verify leave an _ERROR.json sentinel
    # instead of a parquet dump; surface those as red rows FIRST so a
    # failed query can never read as a silent absence (r8 lost 26 queries
    # this way while the artifact showed "0 fails").
    errors = {}
    for p in glob.glob(f"{OUT}/*/_ERROR.json"):
        name = os.path.basename(os.path.dirname(p))
        with open(p) as f:
            errors[name] = json.load(f).get("err", "unknown error")

    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        dump = f"{OUT}/{name}"
        if name in errors:
            results[name] = f"SPARK_QUERY_FAIL: {errors[name]}"
            continue
        files = glob.glob(f"{dump}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        try:
            n_spark = con.sql(
                f"SELECT count(*) FROM read_parquet('{dump}/*.parquet')"
            ).fetchone()[0]
            if n_spark > BIG_ROWS:
                results[name] = check_big(con, name, dump, sql)
                continue
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

    # queries without an oracle: bounded-error check where specified,
    # rows-only otherwise
    for dump in sorted(glob.glob(f"{OUT}/*/")):
        name = os.path.basename(dump.rstrip("/"))
        if name in oracle:
            continue
        if name in errors:
            results[name] = f"SPARK_QUERY_FAIL: {errors[name]}"
            continue
        files = glob.glob(f"{dump}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT(rows-only)"
            continue
        if name in BOUNDED:
            try:
                results[name] = check_bounded(con, name, dump.rstrip("/"),
                                              BOUNDED[name])
            except Exception as e:
                results[name] = f"BOUNDED_FAIL: {e}"
            continue
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{dump}/*.parquet')"
        ).fetchone()[0]
        results[name] = f"ROWS_ONLY: {n}" if n > 0 else "ROWS_ONLY_EMPTY"

    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in results.items():
        flag = "PASS" if v == "OK" else (
            "rows" if v.startswith("ROWS_ONLY:") else (
                "bnd" if v == "OK_BOUNDED" else "FAIL"))
        print(f"[{flag}] {k}: {v}")
    print(f"\n{ok}/{len([k for k in results if k in oracle])} oracle-checked "
          f"queries OK ({len(results)} total, "
          f"{sum(1 for v in results.values() if v == 'OK_BOUNDED')} "
          f"bounded-error OK)")


if __name__ == "__main__":
    main()
