"""spark-submit primary file for the KG-construction pipeline.

    spark-submit --py-files dist/motive_rdf_spark.zip \
        jobs/construct_job.py <source_parquet> <out_dir> [<candidates_parquet>]

On a cluster, add --master/--num-executors etc.; the engine code
arrives on executors via the --py-files zip (built by
tools/make_pyfiles.py). No repo checkout is needed cluster-side.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    src_path, out_dir = sys.argv[1], sys.argv[2]
    cand_path = sys.argv[3] if len(sys.argv) > 3 else None

    spark = SparkSession.builder.appName("motive-rdf-construct").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from motive_rdf_spark.pipeline.materialize import run_pipeline

    source = spark.read.parquet(src_path)
    cands = spark.read.parquet(cand_path) if cand_path else None
    for rep in run_pipeline(spark, source, cands, out_dir):
        status = "skipped" if rep.skipped else f"{rep.n_triples} triples"
        print(f"snapshot {rep.snapshot}: {status}")


if __name__ == "__main__":
    main()
