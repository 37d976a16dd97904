#!/usr/bin/env python3
"""Single-row bench harness: run named registered queries N times each in
one warmed session (bench.py's methodology: noop sink, 32 cores) and
print per-run seconds. Usage: rowbench.py row1,row2,... [n_runs]"""
import json
import os
import sys
import time

REPO = os.environ.get("ROWBENCH_REPO", "/root/repo")
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

rows = sys.argv[1].split(",")
n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main():
    from custom_vector_database_spark.session import get_spark
    from custom_vector_database_spark import queries_registry as reg

    spark = get_spark("cvdb-rowbench", cpus=CPUS, shuffle_partitions=CPUS)
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(CPUS * 4, numPartitions=CPUS).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    out = {}
    for name in rows:
        fn = reg.QUERIES[name]
        ts = []
        for i in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        out[name] = ts
        print(f"ROW {name}: {ts} min={min(ts)}", flush=True)
    print("JSON " + json.dumps(out))


if __name__ == "__main__":
    main()
