#!/usr/bin/env python3
"""Generate scaling-probe data by upsampling sf0.1 N times with
key-consistent offsets (joins keep working; texts/vectors vary per copy
so dedup/fingerprint work scales with the data instead of collapsing).
Usage: gen_sfprobe.py <out_dir> <n_copies> [tables...]"""
import sys

sys.path.insert(0, "/root/repo")
SRC = "/root/testdata/sf0.1"

OUT = sys.argv[1]
N = int(sys.argv[2])
ONLY = set(sys.argv[3:]) or None

from pyspark.sql import functions as F


def main():
    from custom_vector_database_spark.session import get_spark

    spark = get_spark("sfprobe-gen", cpus=32, shuffle_partitions=32)

    def src(t):
        return spark.read.parquet(f"{SRC}/{t}.parquet")

    # per-table key columns to offset by copy * (max+1)
    KEYS = {
        "region": [],
        "nation": [],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    # columns that must VARY per copy so content-derived work scales
    VARY_TEXT = {"documents": "text"}
    VARY_VEC = {"embeddings": "embedding"}

    import os

    os.makedirs(OUT, exist_ok=True)
    for t, keys in KEYS.items():
        if ONLY and t not in ONLY:
            continue
        df = src(t)
        if t in ("region", "nation"):
            df.write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")
            print(t, "copied", flush=True)
            continue
        offs = {}
        for k in keys:
            mx = df.agg(F.max(k)).first()[0]
            offs[k] = int(mx) + 1
        parts = []
        for c in range(N):
            d = df
            for k in keys:
                d = d.withColumn(k, F.col(k) + F.lit(c * offs[k]))
            if c > 0 and t in VARY_TEXT:
                col = VARY_TEXT[t]
                d = d.withColumn(
                    col,
                    F.concat(F.col(col), F.lit(" "),
                             F.md5(F.concat(F.col(col), F.lit(str(c))))),
                )
            if c > 0 and t in VARY_VEC:
                col = VARY_VEC[t]
                d = d.withColumn(
                    col,
                    F.expr(
                        f"transform({col}, x -> CAST(CAST(x AS DOUBLE) * "
                        f"(1.0D + {c} * 1e-4D) + {c} * 1e-5D AS FLOAT))"
                    ),
                )
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(max(8, N)).write.mode("overwrite").parquet(
            f"{OUT}/{t}.parquet"
        )
        print(t, "x", N, "->", spark.read.parquet(
            f"{OUT}/{t}.parquet").count(), flush=True)


main()
