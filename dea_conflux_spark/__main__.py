"""CLI — mirrors the reference's click subcommands
(reference __main__.py: run-one / run-from-queue / get-ids / stack /
filter-from-queue) with the Spark-native equivalents.

    python -m dea_conflux_spark gen        --out DIR [--g 8 --t 4 --w 64]
    python -m dea_conflux_spark drill      --tiles DIR --out DIR
                                           [--plugin waterbodies_c3]
                                           [--resume-ledger PATH]
    python -m dea_conflux_spark get-ids    --tiles DIR [--screen]
    python -m dea_conflux_spark stack      --drill DIR --out DIR
                                           [--mode waterbodies|wit]
    python -m dea_conflux_spark knn        --tiles DIR --points CSV --k 3

The queue apparatus (SQS push / filter / dead-letter) collapses into the
ledger + quarantine tables (operators.ledger); ``drill --resume-ledger``
is the run-from-queue equivalent: idempotent, kill-safe, resumable.
"""

from __future__ import annotations

import argparse
import json
import sys

from . import datagen
from .config import get_spark
from .plugins import REGISTRY, get_plugin


def _grid(args) -> datagen.GridSpec:
    return datagen.GridSpec(G=args.g, T=args.t, w=args.w, h=args.w)


def _polys(grid):
    return datagen.make_polygons(grid)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="dea_conflux_spark")
    ap.add_argument("--cpus", default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    for name in ("gen", "drill", "get-ids", "stack", "knn"):
        p = sub.add_parser(name)
        p.add_argument("--g", type=int, default=8)
        p.add_argument("--t", type=int, default=4)
        p.add_argument("--w", type=int, default=64)
    sub.choices["gen"].add_argument("--out", required=True)
    d = sub.choices["drill"]
    d.add_argument("--tiles", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--plugin", default="waterbodies_c3",
                   choices=sorted(REGISTRY))
    d.add_argument("--resume-ledger", default=None)
    d.add_argument("--no-partial", action="store_true")
    d.add_argument("--rings", default="auto",
                   choices=("auto", "dim", "join"),
                   help="candidate-geometry delivery: pruned dimension "
                        "broadcast (dim), candidate-join payload (join), "
                        "or size-gated auto")
    g = sub.choices["get-ids"]
    g.add_argument("--tiles", required=True)
    g.add_argument("--screen", action="store_true")
    s = sub.choices["stack"]
    s.add_argument("--drill", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--mode", default="waterbodies",
                   choices=["waterbodies", "wit"])
    k = sub.choices["knn"]
    k.add_argument("--tiles", required=True)
    k.add_argument("--points", required=True, help="csv with qid,qx,qy")
    k.add_argument("--k", type=int, default=1)

    args = ap.parse_args(argv)
    spark = get_spark(app=f"conflux-{args.cmd}", cpus=args.cpus)
    grid = _grid(args)

    if args.cmd == "gen":
        polys = _polys(grid)
        datagen.generate_tiles_spark(spark, grid, polys, f"{args.out}/tiles")
        datagen.polygons_df(spark, polys).write.mode("overwrite").parquet(
            f"{args.out}/polygons")
        print(json.dumps({"tiles": grid.G * grid.G * grid.T,
                          "polygons": len(polys), "out": args.out}))

    elif args.cmd == "drill":
        from .operators import drill as drill_op
        from .operators import ledger as ledger_op

        tiles = spark.read.parquet(f"{args.tiles}/tiles")
        polygons = spark.read.parquet(f"{args.tiles}/polygons")
        plugin = get_plugin(args.plugin)
        if args.resume_ledger:
            n = ledger_op.run_drill_resumable(
                tiles, polygons, plugin, grid, f"{args.out}/partials",
                args.resume_ledger)
            final = ledger_op.finalize_drill(
                spark, f"{args.out}/partials", plugin)
            final.write.mode("overwrite").parquet(f"{args.out}/drill")
            print(json.dumps({"drilled": n,
                              "rows": final.count()}))
        else:
            res = drill_op.drill(tiles, polygons, plugin, grid,
                                 partial=not args.no_partial,
                                 rings=args.rings)
            (res.withColumn("day", res.ts.cast("date").cast("string"))
             .write.mode("overwrite").partitionBy("day")
             .parquet(f"{args.out}/drill"))
            print(json.dumps({"rows": spark.read.parquet(
                f"{args.out}/drill").count()}))

    elif args.cmd == "get-ids":
        from .operators import filters
        from .operators.cover import polygon_cover_df

        tiles = spark.read.parquet(f"{args.tiles}/tiles")
        if args.screen:
            polygons = spark.read.parquet(f"{args.tiles}/polygons")
            ids = filters.screened_ids(
                tiles, polygon_cover_df(polygons), grid)
        else:
            ids = tiles.select("image_id")
        for r in ids.collect():
            print(r.image_id)

    elif args.cmd == "stack":
        from .operators import stacking

        drill_df = spark.read.parquet(f"{args.drill}/drill")
        if args.mode == "wit":
            out = stacking.stack_wit(drill_df, f"{args.out}/timeseries")
            print(json.dumps({"mode": "wit", "rows": out.count()}))
        else:
            stacking.stack_waterbodies(drill_df, f"{args.out}/timeseries")
            obs = stacking.observations_fact(
                stacking.dedup_timeseries(drill_df))
            obs.write.mode("overwrite").parquet(f"{args.out}/observations")
            print(json.dumps({"observations": obs.count()}))

    elif args.cmd == "knn":
        from .operators import knn as knn_op

        polygons = spark.read.parquet(f"{args.tiles}/polygons")
        pts = spark.read.option("header", True).csv(args.points) \
            .selectExpr("qid", "cast(qx as double) qx",
                        "cast(qy as double) qy")
        out = knn_op.knn_nearest(pts, polygons, k=args.k)
        for r in out.orderBy("qid", "rank").collect():
            print(f"{r.qid},{r.poly_id},{r.dist:.2f},{r.rank}")

    spark.stop()


if __name__ == "__main__":
    main()
