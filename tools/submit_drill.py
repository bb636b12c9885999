"""spark-submit job script: the flagship drill, packaged per the north
rule (``spark-submit --py-files dist/dea_conflux_spark.zip
tools/submit_drill.py [--g 4 --t 2]``).

The script imports only from the shipped zip (no repo path insertion), so
it runs unchanged on a real multi-executor cluster at any size; the
SparkSession comes from spark-submit's conf (--master local[N] here,
--master yarn/k8s --num-executors N on a cluster).
"""

import argparse
import json

from pyspark.sql import SparkSession

from dea_conflux_spark import datagen
from dea_conflux_spark.operators import drill as drill_op
from dea_conflux_spark.plugins import get_plugin


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--g", type=int, default=4)
    ap.add_argument("--t", type=int, default=2)
    ap.add_argument("--plugin", default="waterbodies_c3")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("conflux-submit-drill").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    grid = datagen.GridSpec(G=args.g, T=args.t)
    polys = datagen.make_polygons(grid, n_small=12, n_medium=2, n_huge=1)
    tiles = datagen.tiles_df(spark, grid, polys)
    polygons = datagen.polygons_df(spark, polys)
    res = drill_op.drill(tiles, polygons, get_plugin(args.plugin), grid)
    print("RESULT_JSON " + json.dumps({
        "rows": res.count(),
        "parallelism": spark.sparkContext.defaultParallelism}))
    spark.stop()


if __name__ == "__main__":
    main()
