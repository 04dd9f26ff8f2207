#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the sf tables, canonicalizes
both sides (columns sorted by name, floats rounded to 6 decimals, rows sorted
by all columns) and compares value-by-value + hash.
"""
import sys, os, json, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            # normalize lists/arrays to tuples for sorting
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def h(df: pd.DataFrame) -> str:
    return hashlib.sha256(df.to_csv(index=False, float_format="%.6f").encode()).hexdigest()[:16]


MEM_LIMIT = os.environ.get("GRAFT_DUCKDB_MEMLIMIT", "8GB")


def fresh_con(sf_dir: str):
    con = duckdb.connect()
    # the auto limit (80% of RAM = ~100 GiB here) lets the buffer pool
    # grow unbounded across a 240-query sweep and trips allocator
    # bad_allocs under sandboxed address-space caps; sf0.01 needs far
    # less — cap it so long sweeps stay flat. Override the cap with
    # GRAFT_DUCKDB_MEMLIMIT (e.g. '40GB') to mirror a bigger-gate
    # harness; every registry oracle is required to fit the 8GB
    # default solo (round-9 audit: the heaviest, q235, fits in 2GB).
    con.sql(f"SET memory_limit='{MEM_LIMIT}'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def run_pair(sf_dir: str, spath: str, sql: str):
    # ONE connection per query: duckdb-python 1.0 accumulates pinned
    # buffer-pool blocks across queries on a shared connection (a
    # 240-query sweep fills ANY memory_limit and dies with bad_alloc /
    # "failed to pin block"); short-lived connections keep the pool
    # flat and make each query independent
    con = fresh_con(sf_dir)
    try:
        got = canon(con.sql(f"SELECT * FROM '{spath}/*.parquet'").df())
        want = canon(con.sql(sql).df())
        return got, want
    finally:
        con.close()


def main(sf_dir: str, out_dir: str) -> int:
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    failures = 0
    for name in sorted(oracle):
        spath = os.path.join(out_dir, name)
        if not os.path.isdir(spath):
            print(f"FAIL {name}: no spark output at {spath}")
            failures += 1
            continue
        try:
            got, want = run_pair(sf_dir, spath, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
        elif [str(t) for t in got.dtypes] != [str(t) for t in want.dtypes]:
            print(f"FAIL {name}: dtypes "
                  f"{[(c, str(got[c].dtype)) for c in got.columns]} != "
                  f"{[(c, str(want[c].dtype)) for c in want.columns]}")
            failures += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
        elif h(got) != h(want):
            print(f"FAIL {name}: hash mismatch ({h(got)} vs {h(want)})")
            neq = (got != want) & ~(got.isna() & want.isna())
            bad = neq.any(axis=1)
            print(pd.concat([got[bad].head(3).add_suffix("_spark"),
                             want[bad].head(3).add_suffix("_duck")], axis=1))
            failures += 1
        else:
            print(f"OK   {name} ({len(got)} rows, {h(got)})")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
