#!/usr/bin/env python3
"""Synthesize a scaled-up testdata directory from a driver-generated one,
for off-driver scaling sanity runs (BENCH_SF1.md).

Usage: make_scaled_sf.py SRC_DIR DST_DIR [SHARDS=10]

Method: SHARDS key-shifted copies of every scaling table, so joins stay
consistent within a shard and shards never cross-match:
  - fixed-size dims (region, nation) are copied once;
  - fact/dim keys shift by shard * stride (orderkey <-> l_orderkey,
    custkey <-> o_custkey, etc. shift together);
  - documents get a DISJOINT per-shard vocabulary (word -> word_<i>) so
    distinct-shingle and near-dup structure scales like real corpus
    growth instead of producing 10x exact replicas (which would blow up
    LSH bucket sizes quadratically and misrepresent sf1);
  - embeddings keep their vectors (scoring cost scales with rows), only
    vec_ids shift; ANN queries (vec_id < 5) stay the shard-0 five.

This is a TIMING dataset only — never a correctness oracle input: the
value distributions are the driver's, but the cross-shard independence
is synthetic.
"""
import sys

import duckdb


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    shards = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    con = duckdb.connect()
    import shutil
    for t in ["region", "nation"]:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

    shift = {
        "customer": {"c_custkey": 1_000_000},
        "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
        "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000,
                     "l_suppkey": 1_000_000},
        "part": {"p_partkey": 1_000_000},
        "supplier": {"s_suppkey": 1_000_000},
        "events": {"event_id": 10_000_000, "user_id": 1_000_000},
        "embeddings": {"vec_id": 1_000_000},
    }
    for t, cols in shift.items():
        desc = con.sql(f"describe select * from '{src}/{t}.parquet'").fetchall()
        parts = []
        for i in range(shards):
            sel = ", ".join(
                f"({c} + {cols[c] * i}) AS {c}" if c in cols else c
                for c, *_ in desc)
            parts.append(f"SELECT {sel} FROM '{src}/{t}.parquet'")
        con.sql(f"COPY ({' UNION ALL '.join(parts)}) "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(t, con.sql(f"select count(*) from '{dst}/{t}.parquet'")
              .fetchone()[0])

    parts = []
    for i in range(shards):
        if i == 0:
            parts.append("SELECT doc_id, text, lang, source, n_chars "
                         f"FROM '{src}/documents.parquet'")
        else:
            sub = f"regexp_replace(text, '(\\S+)', '\\1_{i}', 'g')"
            parts.append(
                f"SELECT doc_id + {1_000_000 * i} AS doc_id, "
                f"{sub} AS text, lang, source, "
                f"CAST(length({sub}) AS BIGINT) AS n_chars "
                f"FROM '{src}/documents.parquet'")
    con.sql(f"COPY ({' UNION ALL '.join(parts)}) "
            f"TO '{dst}/documents.parquet' (FORMAT PARQUET)")
    print("documents",
          con.sql(f"select count(*) from '{dst}/documents.parquet'")
          .fetchone()[0])


if __name__ == "__main__":
    main()
