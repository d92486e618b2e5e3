#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB over views named
after the tables in <sfDir>, and compares: schema (column names), row count,
and values (columns sorted by name, rows sorted, exact compare with a small
float tolerance reported separately).

Dev-only tool — the shipped engine has no Python dependency.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    import numpy as np
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize date/datetime-ish columns to ISO strings, nulls to '∅',
    # so None (pandas object) and NaT (datetime64) compare equal
    for c in df.columns:
        s = df[c]
        if s.dtype.kind in 'mM' or (s.dtype == object and s.map(
                lambda v: v is None or hasattr(v, 'isoformat')).all()):
            df[c] = s.map(lambda v: '∅' if v is None or v != v
                          else pd.Timestamp(v).isoformat())
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(out_dir)):
        d = f"{out_dir}/{name}"
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files \
            else pd.DataFrame()
        if name not in oracle:
            print(f"SKIP {name}: rows-only ({len(got)} rows)")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        g, e = norm(got.copy()), norm(exp.copy())
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs "
                  f"{list(e.columns)}")
            n_bad += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_bad += 1
            continue
        bad_cols = []
        for c in g.columns:
            a, b = g[c], e[c]
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    import numpy as np
                    aa = a.astype(float).to_numpy()
                    bb = b.astype(float).to_numpy()
                    m = ~(pd.isna(aa) & pd.isna(bb))
                    if not np.allclose(aa[m], bb[m], rtol=0, atol=0,
                                       equal_nan=True):
                        mx = np.nanmax(np.abs(aa - bb))
                        bad_cols.append(f"{c} (float, maxdiff={mx})")
                else:
                    if not a.astype(str).equals(b.astype(str)):
                        i = (a.astype(str) != b.astype(str)).idxmax()
                        bad_cols.append(
                            f"{c} (e.g. row {i}: {a[i]!r} vs {b[i]!r})")
            except Exception as ex:
                bad_cols.append(f"{c} (compare error: {ex})")
        if bad_cols:
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(g)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad, "
          f"{sum(1 for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n)) and n not in oracle)} rows-only")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
