#!/usr/bin/env python3
"""External bench anchor: time the bench headliners' oracle SQL in DuckDB
on the same parquet tables, same machine, and write duckdb_baseline.json.

DuckDB here is an in-process vectorized OLAP engine at full parallelism —
an unflattering, honest comparison point for Spark local[32], whose JVM/
shuffle overheads a single-node engine does not pay. The point is to make
BASELINE.md's "within 2x" gate falsifiable, not to win it at sf0.1; Spark's
payoff is the 1000-executor scale-out DuckDB does not have.

Usage: python3 scripts/duckdb_bench.py <sf_dir> <oracle_sql.json> [N] [out.json]
Writes duckdb_baseline.json (or out.json) next to this repo's root:
{query: min_seconds}. sf_dir may hold either single-file tables
(<t>.parquet) or Spark-written directories (<t>.parquet/part-*.parquet) —
the inflated x16 twin is the latter.
Queries without an oracle (e.g. q_dedup_minhash's seeded xxhash pipeline is
not DuckDB-expressible) are omitted — Bench reports no ratio for them.
"""
import sys, os, json, time
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
# fallback only: the authority is bench_set.json written by graft.Verify
# next to oracle_sql.json (QueryDef.bench) — read when present so this
# list cannot silently drift when the bench set changes
BENCH_FALLBACK = ["q_q1", "q_revenue_by_nation", "q_window_lag", "q_pipeline",
                  "q_dedup_exact", "q_dedup_minhash", "q_ann_cosine", "q_sessionize",
                  "q_substring_spans"]

def bench_set(oracle_json):
    p = os.path.join(os.path.dirname(oracle_json), "bench_set.json")
    if os.path.exists(p):
        return json.load(open(p))
    print(f"-- {p} not found; using the hardcoded fallback bench list")
    return BENCH_FALLBACK

def main(sf_dir, oracle_json, n=5, out_name="duckdb_baseline.json"):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written directory table
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(oracle_json))
    out = {}
    for name in bench_set(oracle_json):
        sql = oracle.get(name)
        if sql is None:
            print(f"-- {name}: no oracle SQL, skipped")
            continue
        con.sql(sql).fetchall()  # warm the file cache / plan
        best = min(
            (lambda t0: (con.sql(sql).fetchall(), time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(n))
        out[name] = round(best, 6)
        print(f"   {name}: {best:.3f}s")
    meta = {"sf_dir": sf_dir, "n": int(n), "threads":
            con.sql("SELECT current_setting('threads')").fetchone()[0]}
    dest = os.path.join(os.path.dirname(__file__), "..", out_name)
    with open(dest, "w") as f:
        json.dump({"queries": out, "meta": meta}, f, indent=1, sort_keys=True)
    print(f"wrote {os.path.abspath(dest)}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 5,
         sys.argv[4] if len(sys.argv) > 4 else "duckdb_baseline.json")
