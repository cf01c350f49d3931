#!/usr/bin/env python3
"""Pandas-path replica of the driver's correctness compare.

tools/check.py compares via DuckDB fetchall on both sides, which
masks dtype divergence (round 1: Spark parquet decimals surface as
decimal.Decimal objects while DuckDB decimals surface as float64 —
values equal, driver hash different). This replica reads the Spark
results through pandas/pyarrow and the oracle through duckdb.df(),
then requires EXACT frame equality after column/row sorting — the
same failure surface as the driver.

Usage: python3 tools/check_pandas.py <sfDir> <outDir>
"""
import glob, json, os, sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # normalize timestamp resolution: pyarrow surfaces parquet ts as
        # ns, duckdb as us — the driver's value compare accepts this
        # (q_trace_intervals was hash-green in round 1)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last")
    return df.reset_index(drop=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    # oracle-dump drift gate (mirrors check.py): the committed repo dump
    # must carry exactly the fresh dump's query names.
    repo_dump = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "oracle_sql.json")
    if os.path.exists(repo_dump):
        committed = json.load(open(repo_dump))
        if committed != oracles:  # full-dict compare: names AND SQL bodies
            print(f"FAIL oracle_sql.json drift: committed {len(committed)} "
                  f"vs registry {len(oracles)} queries (or edited SQL "
                  f"bodies) — refresh the committed dump from "
                  f"<outDir>/oracle_sql.json")
            failures += 1
    for name, sql in sorted(oracles.items()):
        try:
            spark = pd.concat([pd.read_parquet(f) for f in
                               sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))],
                              ignore_index=True)
            orc = con.execute(sql).df()
            s, o = canon(spark), canon(orc)
            if list(s.columns) != list(o.columns):
                print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}")
                failures += 1
            elif len(s) != len(o):
                print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
                failures += 1
            elif not s.equals(o):
                # pinpoint: dtype divergence vs value divergence
                dt = {c: (str(s[c].dtype), str(o[c].dtype))
                      for c in s.columns if s[c].dtype != o[c].dtype}
                print(f"FAIL {name}: frames differ; dtype deltas: {dt}")
                failures += 1
            else:
                print(f"ok   {name}: {len(s)} rows, dtypes exact")
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures += 1
    print(f"{len(oracles) - failures}/{len(oracles)} queries match (pandas path)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
