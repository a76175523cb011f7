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
    """Canonical sorted row-strings. Vectorized per column (the row-wise
    itertuples loop was the bottleneck at sf1: 571k-row outputs took
    minutes per gate); cell normalization is unchanged."""
    df = df[sorted(df.columns)]
    if len(df) == 0:
        return []
    cols = []
    for c in df.columns:
        s = df[c]
        kind = getattr(s.dtype, "kind", "O")
        if kind in "iu":
            cols.append(s.astype(str))
        elif kind == "b":
            cols.append(s.map(str))
        elif kind == "f":
            cols.append(s.map(lambda v: "nan" if math.isnan(v) else f"{v:.9g}"))
        elif kind == "M":  # datetime64, tz-aware or not
            sn = s.dt.tz_localize(None) if getattr(s.dt, "tz", None) is not None else s
            cols.append(sn.map(lambda v: v.isoformat()))
        else:
            cols.append(s.map(norm_cell))
    joined = cols[0].str.cat(cols[1:], sep="|") if len(cols) > 1 else cols[0]
    return sorted(joined.tolist())


def main(sf_dir, out_dir):
    con = duckdb.connect()
    # bound DuckDB so a quadratic oracle at a big scale factor fails
    # with a clear error instead of an OOM kill; knobs overridable
    con.execute(f"SET memory_limit='{os.environ.get('SELFCHECK_MEM', '32GB')}'")
    con.execute(f"SET threads={os.environ.get('SELFCHECK_THREADS', '16')}")
    skip = set(filter(None, os.environ.get("SELFCHECK_SKIP", "").split(",")))
    # SELFCHECK_SHARD="i/N": process only every N-th oracled gate
    # (deterministic by sorted name) — lets a big-SF sweep run as N
    # parallel worker processes, each its own DuckDB (size MEM*N to the
    # machine). The rows-only listing prints from shard 0 only.
    shard_i, shard_n = 0, 1
    if os.environ.get("SELFCHECK_SHARD"):
        shard_i, shard_n = map(int, os.environ["SELFCHECK_SHARD"].split("/"))
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
    for idx, (name, sql) in enumerate(sorted(oracle.items())):
        if idx % shard_n != shard_i:
            continue
        if name in skip:
            print(f"SKIP  {name} (SELFCHECK_SKIP)")
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISS  {name}: no spark output")
            n_fail += 1
            continue
        # SELFCHECK_TIMEOUT_S: per-gate oracle budget. A quadratic SQL
        # oracle that is fine at the driver's gate SF can be infeasible
        # at a 10x sweep SF — interrupt it and report TIMEOUT (counted
        # as a failure so the caller must explicitly skip-and-document).
        timeout_s = int(os.environ.get("SELFCHECK_TIMEOUT_S", "0"))
        timer = None
        timed_out = []
        if timeout_s:
            import threading
            def _interrupt():
                timed_out.append(True)
                con.interrupt()
            timer = threading.Timer(timeout_s, _interrupt)
            timer.start()
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            want = con.execute(sql).df()
        except Exception as e:
            if timed_out:
                print(f"TIMEOUT {name}: oracle exceeded {timeout_s}s")
            else:
                print(f"ERR   {name}: {str(e)[:160]}")
            n_fail += 1
            continue
        finally:
            if timer:
                timer.cancel()
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
    for d in sorted(glob.glob(f"{out_dir}/*/")) if shard_i == 0 else []:
        name = d.rstrip("/").split("/")[-1]
        if name not in oracle:
            try:
                n = len(pd.read_parquet(d))
                print(f"ROWS  {name}: {n} rows {'(EMPTY!)' if n == 0 else ''}")
            except Exception as e:
                print(f"ERR   {name}: {str(e)[:120]}")
    processed = n_pass + n_fail
    shard_note = f" (shard {shard_i}/{shard_n} of {len(oracle)})" if shard_n > 1 else ""
    print(f"\n{n_pass} pass, {n_fail} fail of {processed} oracled queries{shard_note}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
