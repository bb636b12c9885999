"""Round-6 optimization measurement harness (bench.py is FROZEN — this
file carries the extra per-query isolation runs the optimization round
needs: noop-sink timing per query plus .explain("formatted") captures).

Usage:
  python bench_extra.py --queries q1_pricing_summary,doc_tfidf_top_terms
  python bench_extra.py --all --sf /root/testdata/sf1.0 --tag before
  python bench_extra.py --docs-scaled --tag before

Writes plans to plans/r06/<query>_<tag>.txt and prints one JSON line of
per-query best-of-N seconds (same noop-sink methodology as bench.py's
run_queries).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# bench.py's timed query roster (keep in sync manually; bench.py is frozen)
BENCH_QUERIES = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_nation_revenue",
    "topk_orders_per_customer", "day_dedup_best_events",
    "sessionize_events", "range_join_error_context",
    "doc_token_counts", "docs_exact_dedup", "docs_ngram_jaccard_pairs",
    "docs_minhash_rows", "docs_simhash", "ann_brute_topk",
    "ann_ivf_topk", "doc_tfidf_top_terms", "embedding_label_centroids",
    "doc_bm25_topk", "embedding_kmeans_assign",
    "embedding_semantic_dedup",
]

DOCS_SCALED_QUERIES = [
    "doc_token_counts", "docs_exact_dedup", "docs_ngram_jaccard_pairs",
    "docs_minhash_rows", "docs_simhash", "docs_minhash_lsh_pairs",
    "docs_simhash_pairs", "doc_tfidf_top_terms", "docs_neardup_components",
]


def _session(cpus: int):
    from dea_conflux_spark.config import get_spark

    return get_spark(app=f"bench-extra-{cpus}", cpus=cpus,
                     shuffle_partitions=max(8, 2 * cpus))


def time_queries(spark, sf_dir: str, names: list[str], repeat: int,
                 tag: str | None, plans_dir: str) -> dict:
    import __spark_entry__ as em

    qs = em.queries()
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    out = {}
    os.makedirs(plans_dir, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        if tag:
            df = qs[name](spark, sf_dir)
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"),
                      "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        best = float("inf")
        for _ in range(repeat):
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        out[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
        print(f"  {name}: {out[name]}", file=sys.stderr)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=str, default=None,
                    help="comma-separated query names")
    ap.add_argument("--all", action="store_true",
                    help="run bench.py's full timed roster")
    ap.add_argument("--docs-scaled", action="store_true",
                    help="run the 100k-doc scaled documents family")
    ap.add_argument("--sf", type=str,
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf1.0"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--tag", type=str, default=None,
                    help="if set, dump explain(formatted) to "
                         "plans/r06/<q>_<tag>.txt")
    args = ap.parse_args()

    spark = _session(args.cpus)
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r06")
    result = {"sf": args.sf, "cpus": args.cpus}
    if args.docs_scaled:
        import bench

        docs_dir = bench.ensure_docs_scaled(spark, args.sf,
                                            bench.REP_DOCS)
        result["docs_scaled"] = time_queries(
            spark, docs_dir, DOCS_SCALED_QUERIES, args.repeat,
            (args.tag + "_docs100k") if args.tag else None, plans_dir)
    else:
        names = (BENCH_QUERIES if args.all
                 else [s for s in (args.queries or "").split(",") if s])
        result["queries"] = time_queries(spark, args.sf, names,
                                         args.repeat, args.tag, plans_dir)
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
