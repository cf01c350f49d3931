#!/usr/bin/env python3
"""Time every committed DuckDB oracle at a given sf dir — the judge's
2x-bound check as a repeatable artifact. WARN-only tooling.

Usage: python3 tools/time_oracles.py <sfDir> [threads]
"""
import json, os, sys, time

import duckdb


def main(sf_dir, threads=32):
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception as e:  # WARN-only tool: still produce an artifact
            print(f"WARN cannot view {t}: {e}", file=sys.stderr)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    oracles = json.load(open(os.path.join(here, "oracle_sql.json")))
    total, times, errs = 0.0, {}, {}
    for name, sql in sorted(oracles.items()):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
        except Exception as e:
            errs[name] = str(e)[:120]
            continue  # a failed oracle's elapsed time is NOT DuckDB's
            # cost for the query — including it would skew total_s
        dt = time.time() - t0
        times[name] = round(dt, 3)
        total += dt
    out = {"sf": sf_dir, "threads": threads, "total_s": round(total, 1),
           "n": len(oracles), "n_ok": len(times), "errs": errs,
           "slowest": dict(sorted(times.items(), key=lambda x: -x[1])[:10])}
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 32)
