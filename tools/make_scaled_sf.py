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
  - embeddings get per-shard JITTERED CLUSTERS (shard 0 verbatim so the
    ANN queries vec_id < 5 stay the originals): each later shard blends
    the source vector (0.6x) with a deterministic per-shard direction
    (0.5x, one coarse cluster per shard) and per-row hash noise (0.8x).
    Verbatim copies would make the sf1 semantic structure 10 exact
    replicas -- every cross-shard self-pair at cosine 1.0, a fake
    quadratic cliff for q35/q75-q77 -- while the blend scales like a
    real clustered corpus: measured within-shard coherence ~0.28
    cosine, cross-shard self-pairs ~0.1 (drifted, not identical).

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
            parts.append(
                f"SELECT vec_id, embedding, label "
                f"FROM '{src}/embeddings.parquet'")
        else:
            jit = (
                "[CAST(0.6 * embedding[j] "
                f"+ 0.5 * ((CAST(hash({i} * 1000003 + j) % 2001 AS BIGINT)"
                " - 1000) / 1000.0) "
                f"+ 0.8 * ((CAST(hash(vec_id * 1000003 + {i} * 10007 + j)"
                " % 2001 AS BIGINT) - 1000) / 1000.0) AS FLOAT) "
                "FOR j IN range(1, len(embedding) + 1)]")
            parts.append(
                f"SELECT vec_id + {1_000_000 * i} AS vec_id, "
                f"{jit} AS embedding, label "
                f"FROM '{src}/embeddings.parquet'")
    con.sql(f"COPY ({' UNION ALL '.join(parts)}) "
            f"TO '{dst}/embeddings.parquet' (FORMAT PARQUET)")
    print("embeddings",
          con.sql(f"select count(*) from '{dst}/embeddings.parquet'")
          .fetchone()[0])

    parts = []
    for i in range(shards):
        if i == 0:
            shard_sel = (f"SELECT doc_id, text, lang, source, n_chars "
                         f"FROM '{src}/documents.parquet'")
        else:
            sub = f"regexp_replace(text, '(\\S+)', '\\1_{i}', 'g')"
            shard_sel = (
                f"SELECT doc_id + {1_000_000 * i} AS doc_id, "
                f"{sub} AS text, lang, source, "
                f"CAST(length({sub}) AS BIGINT) AS n_chars "
                f"FROM '{src}/documents.parquet'")
        parts.append(shard_sel)
        # LONG documents (multi-hundred-token): every 5th shard doc,
        # concatenated in overlapping windows of 10 (the A/B grids are
        # offset by 5 subset docs), so consecutive long docs share a
        # ~225-token passage at a DIFFERENT token offset — the regime
        # chunk-level substring dedup at chunkTokens=50 exists for.
        # doc_id bands: 500M + 40000*shard + 2g (A) / +2g+1 (B), disjoint
        # from every shard band and from each other.
        for off, par in ((0, "A"), (5, "B")):
            parts.append(
                "SELECT "
                f"{500_000_000} + 2 * CAST(floor((doc_id / 5 + {off}) / 10) "
                f"AS BIGINT) + {1 if par == 'B' else 0} AS doc_id, "
                "string_agg(text, ' ' ORDER BY doc_id) AS text, "
                "'en' AS lang, 'synthlong' AS source, "
                "CAST(length(string_agg(text, ' ' ORDER BY doc_id)) "
                "AS BIGINT) AS n_chars "
                f"FROM ({shard_sel}) WHERE doc_id % 5 = 0 "
                f"GROUP BY floor((doc_id / 5 + {off}) / 10)")
    con.sql(f"COPY ({' UNION ALL '.join(parts)}) "
            f"TO '{dst}/documents.parquet' (FORMAT PARQUET)")
    print("documents",
          con.sql(f"select count(*) from '{dst}/documents.parquet'")
          .fetchone()[0])


if __name__ == "__main__":
    main()
