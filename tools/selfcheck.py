#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare (schema-insensitively: columns sorted
by name, rows sorted, values normalized) against the Spark parquet dumps
produced by graft.Verify. Not part of the library — developer tooling only.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None).isoformat() if v.tzinfo else v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def canon(df):
    df = df[sorted(df.columns)]
    rows = ["|".join(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    # bound DuckDB so a quadratic oracle at a big scale factor fails
    # with a clear error instead of an OOM kill; knobs overridable
    con.execute(f"SET memory_limit='{os.environ.get('SELFCHECK_MEM', '32GB')}'")
    con.execute(f"SET threads={os.environ.get('SELFCHECK_THREADS', '16')}")
    skip = set(filter(None, os.environ.get("SELFCHECK_SKIP", "").split(",")))
    for t in TABLES:
        # driver fixtures are single files; Spark-written fixtures
        # (AmplifyTestdata) are directories of part files
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP  {name} (SELFCHECK_SKIP)")
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISS  {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            want = con.execute(sql).df()
        except Exception as e:
            print(f"ERR   {name}: {str(e)[:160]}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"COLS  {name}: spark={sorted(got.columns)} duck={sorted(want.columns)}")
            n_fail += 1
            continue
        cg, cw = canon(got), canon(want)
        if cg == cw:
            n_pass += 1
            print(f"OK    {name} ({len(cg)} rows)")
        else:
            n_fail += 1
            diff_g = [r for r in cg if r not in set(cw)][:3]
            diff_w = [r for r in cw if r not in set(cg)][:3]
            print(f"DIFF  {name}: rows spark={len(cg)} duck={len(cw)}")
            for r in diff_g:
                print(f"        spark-only: {r[:150]}")
            for r in diff_w:
                print(f"        duck-only:  {r[:150]}")
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracle:
            try:
                n = len(pd.read_parquet(d))
                print(f"ROWS  {name}: {n} rows {'(EMPTY!)' if n == 0 else ''}")
            except Exception as e:
                print(f"ERR   {name}: {str(e)[:120]}")
    print(f"\n{n_pass} pass, {n_fail} fail of {len(oracle)} oracled queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
