"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship polygon-drill end-to-end on a small
deterministic synthetic tile grid (the engine's own input shape per
BASELINE.json input_hint — tiles are synthesised, not read from testdata).
``queries()``/``oracle_sql()`` cover the SURVEY.md §2 operator inventory on
the driver's TPC-H-ish tables with exact DuckDB oracles; geospatial
operators that have no relational analogue are included as rows-only
checks (no oracle entry) and are golden-tested against the numpy oracle in
``tests/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from dea_conflux_spark import datagen, queries as Q  # noqa: E402
from dea_conflux_spark.operators import drill as drill_op  # noqa: E402
from dea_conflux_spark.operators import knn as knn_op  # noqa: E402
from dea_conflux_spark.plugins import get_plugin  # noqa: E402

# Small deterministic synthetic scene for the geospatial entries.
_GRID = datagen.GridSpec(G=3, T=2, w=64, h=64)
_POLYS = None


def _synthetic(spark):
    global _POLYS
    if _POLYS is None:
        _POLYS = datagen.make_polygons(_GRID, n_small=12, n_medium=2,
                                       n_huge=1)
    tiles = datagen.tiles_df(spark, _GRID, _POLYS)
    polygons = datagen.polygons_df(spark, _POLYS)
    return tiles, polygons


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: wet/dry/invalid pixel fractions per waterbody per timestep
    (cell-cover equi-join + exact PIP refine + zonal aggregation)."""
    tiles, polygons = _synthetic(spark)
    return drill_op.drill(tiles, polygons, get_plugin("waterbodies_c3"),
                          _GRID, partial=True)


def _flagship_drill(spark, sf_dir):
    return entry(spark)


def _flagship_drill_cogrouped(spark, sf_dir):
    """The Exchange-free huge-layer execution path (Pandas cogroup on the
    grid-slot key): must emit the same rows as the flagship drill —
    golden-tested bit-identical in tests/test_drill.py."""
    tiles, polygons = _synthetic(spark)
    return drill_op.drill_cogrouped(tiles, polygons,
                                    get_plugin("waterbodies_c3"), _GRID,
                                    partial=True)


def _sum_wet_drill(spark, sf_dir):
    tiles, polygons = _synthetic(spark)
    return drill_op.drill(tiles, polygons, get_plugin("sum_wet"), _GRID,
                          partial=False)


def _wit_drill(spark, sf_dir):
    from dea_conflux_spark.plugins import get_plugin as _gp

    global _POLYS
    _synthetic(spark)
    wit_pdf = datagen.make_wit_tiles_pdf(_GRID, _POLYS)
    tiles = spark.createDataFrame(wit_pdf, schema=datagen.TILE_SCHEMA)
    polygons = datagen.polygons_df(spark, _POLYS)
    return drill_op.drill(tiles, polygons, _gp("wit_ls9"), _GRID,
                          partial=False)


def _knn_points(spark, sf_dir):
    import pandas as pd

    tiles, polygons = _synthetic(spark)
    x0, y0, x1, y1 = _GRID.extent
    n = 40
    import numpy as np
    rng = np.random.default_rng(11)
    qpdf = pd.DataFrame({
        "qid": [f"q{i:03d}" for i in range(n)],
        "qx": rng.uniform(x0, x1, n), "qy": rng.uniform(y0, y1, n)})
    qdf = spark.createDataFrame(qpdf, "qid string, qx double, qy double")
    return knn_op.knn_nearest(qdf, polygons, k=2, res=9, ring=1)


def _mini_drill(spark, sf_dir):
    from dea_conflux_spark import minidrill

    return minidrill.mini_drill(spark, sf_dir)


def _mini_drill_cogrouped(spark, sf_dir):
    from dea_conflux_spark import minidrill

    return minidrill.mini_drill(spark, sf_dir, mode="cogrouped")


def _mini_drill_salted(spark, sf_dir):
    from dea_conflux_spark import minidrill

    return minidrill.mini_drill(spark, sf_dir, mode="salted")


def _mini_knn(spark, sf_dir):
    from dea_conflux_spark import minidrill

    return minidrill.mini_knn(spark, sf_dir)


def _mini_knn_shuffle(spark, sf_dir):
    from dea_conflux_spark import minidrill

    return minidrill.mini_knn(spark, sf_dir, broadcast_index=False)


def _mini_drill_flags(spark, sf_dir):
    from dea_conflux_spark import minidrill

    return minidrill.mini_drill_flags(spark, sf_dir)


def _mini_image_stats(spark, sf_dir):
    from dea_conflux_spark import minidrill

    return minidrill.mini_image_stats(spark, sf_dir)


def _mini_poly_overlap(spark, sf_dir):
    from dea_conflux_spark import minidrill

    return minidrill.mini_poly_overlap(spark, sf_dir)


def _mini_wofs_summary(spark, sf_dir):
    """Gate note: the oracle's SUM(CASE ...) counts come back from
    DuckDB as HUGEINT -> pandas float64 while the operator emits
    bigint; values are identical, so the gate aligns the dtype to the
    oracle's the same way docs_pack_sequences does (integer-valued
    doubles are exact far beyond any pixel count).  The library
    operator keeps its integer columns."""
    from pyspark.sql import functions as F

    from dea_conflux_spark import minidrill

    out = minidrill.mini_wofs_summary(spark, sf_dir)
    return out.withColumn("n_wet", F.col("n_wet").cast("double")) \
              .withColumn("n_clear", F.col("n_clear").cast("double"))


def _mini_image_neardup(spark, sf_dir):
    from dea_conflux_spark import minidrill

    return minidrill.mini_image_neardup(spark, sf_dir)


def _mini_image_resize_stats(spark, sf_dir):
    from dea_conflux_spark import minidrill

    return minidrill.mini_image_resize_stats(spark, sf_dir)


def _mini_image_histogram(spark, sf_dir):
    from dea_conflux_spark import minidrill

    return minidrill.mini_image_histogram(spark, sf_dir)


def _mini_audio_stats(spark, sf_dir):
    from dea_conflux_spark import minidrill

    return minidrill.mini_audio_stats(spark, sf_dir)


def _mini_audio_chunks(spark, sf_dir):
    from dea_conflux_spark import minidrill

    return minidrill.mini_audio_chunks(spark, sf_dir)


def _mini_audio_resample_stats(spark, sf_dir):
    from dea_conflux_spark import minidrill

    return minidrill.mini_audio_resample_stats(spark, sf_dir)


def _mini_frame_sample_stats(spark, sf_dir):
    from dea_conflux_spark import minidrill

    return minidrill.mini_frame_sample_stats(spark, sf_dir)


def _mini_image_flip(spark, sf_dir):
    from dea_conflux_spark import minidrill

    return minidrill.mini_image_flip(spark, sf_dir)


def _mini_image_patches(spark, sf_dir):
    from dea_conflux_spark import minidrill

    return minidrill.mini_image_patches(spark, sf_dir)


def _mini_chip_stats(spark, sf_dir):
    from dea_conflux_spark import minidrill

    return minidrill.mini_chip_stats(spark, sf_dir)


def _mini_wit(spark, sf_dir):
    from dea_conflux_spark import minidrill

    return minidrill.mini_wit(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # aggregations / scans
        "q1_pricing_summary": Q.q1_pricing_summary,
        "q3_shipping_priority": Q.q3_shipping_priority,
        "q5_nation_revenue": Q.q5_nation_revenue,
        "monthly_order_stats": Q.monthly_order_stats,
        "pivot_orderstatus": Q.pivot_orderstatus,
        "bitwise_linenumber_flags": Q.bitwise_linenumber_flags,
        "cube_order_counts": Q.cube_order_counts,
        "revenue_percentiles": Q.revenue_percentiles,
        # windows
        "topk_orders_per_customer": Q.topk_orders_per_customer,
        "day_dedup_best_events": Q.day_dedup_best_events,
        "event_lead_delta": Q.event_lead_delta,
        "running_total_per_customer": Q.running_total_per_customer,
        "sessionize_events": Q.sessionize_events,
        "asof_signup_before_purchase": Q.asof_signup_before_purchase,
        "range_join_error_context": Q.range_join_error_context,
        # joins / set ops / scalars
        "knn_acctbal": Q.knn_acctbal,
        "customers_without_orders": Q.customers_without_orders,
        "customers_with_orders": Q.customers_with_orders,
        "union_distinct_keys": Q.union_distinct_keys,
        "intersect_nation_keys": Q.intersect_nation_keys,
        "orderkey_chunk_slice": Q.orderkey_chunk_slice,
        "events_json_extract": Q.events_json_extract,
        "events_zorder_blocks": Q.events_zorder_blocks,
        "wit_normalise_demo": Q.wit_normalise_demo,
        # documents / text analysis
        "doc_token_counts": Q.doc_token_counts,
        "doc_pii_scrub": Q.doc_pii_scrub,
        "doc_quality_scores": Q.doc_quality_scores,
        "doc_lang_id": Q.doc_lang_id,
        "doc_repetition_signals": Q.doc_repetition_signals,
        "doc_fingerprints": Q.doc_fingerprints,
        "doc_tfidf_top_terms": Q.doc_tfidf_top_terms,
        "doc_bm25_topk": Q.doc_bm25_topk,
        "docs_top_bigrams": Q.docs_top_bigrams,
        # deterministic sampling / splits
        "docs_split_assign": Q.docs_split_assign,
        "docs_stratified_sample": Q.docs_stratified_sample,
        "docs_pack_sequences": Q.docs_pack_sequences,
        "docs_mixture_sample": Q.docs_mixture_sample,
        "doc_chunks": Q.doc_chunks,
        "docs_quality_filter": Q.docs_quality_filter,
        "embedding_quantize": Q.embedding_quantize,
        # dedup family
        "docs_exact_dedup": Q.docs_exact_dedup,
        "docs_canonical_best_quality": Q.docs_canonical_best_quality,
        "docs_decontaminate": Q.docs_decontaminate,
        "docs_ngram_jaccard_pairs": Q.docs_ngram_jaccard_pairs,
        "docs_minhash_rows": Q.docs_minhash_rows,
        "docs_minhash_lsh_pairs": Q.docs_minhash_lsh_pairs,
        "docs_simhash": Q.docs_simhash,
        "docs_simhash_pairs": Q.docs_simhash_pairs,
        "docs_neardup_components": Q.docs_neardup_components,
        "docs_dedup_corpus_keepset": Q.docs_dedup_corpus_keepset,
        "embedding_neardup": Q.embedding_neardup,
        # similarity search
        "embedding_label_centroids": Q.embedding_label_centroids,
        "embedding_kmeans_assign": Q.embedding_kmeans_assign,
        "embedding_semantic_dedup": Q.embedding_semantic_dedup,
        "ann_brute_topk": Q.ann_brute_topk,
        "ann_ivf_topk": Q.ann_ivf_topk,
        # rows-only: approximate configuration, recall floor in tests
        "ann_ivf_partial_probe": Q.ann_ivf_partial_probe,
        # geospatial: flagship + kNN semantics with EXACT second-engine
        # checks — convex polygons drill as half-plane SQL, centroid kNN
        # as brute-force SQL (minidrill.py)
        "mini_drill": _mini_drill,
        "mini_drill_cogrouped": _mini_drill_cogrouped,
        "mini_drill_salted": _mini_drill_salted,
        "mini_drill_flags": _mini_drill_flags,
        "mini_poly_overlap": _mini_poly_overlap,
        "mini_wofs_summary": _mini_wofs_summary,
        "mini_wit": _mini_wit,
        "mini_knn": _mini_knn,
        "mini_knn_shuffle": _mini_knn_shuffle,
        "mini_image_stats": _mini_image_stats,
        "mini_image_neardup": _mini_image_neardup,
        "mini_image_resize_stats": _mini_image_resize_stats,
        "mini_image_histogram": _mini_image_histogram,
        "mini_image_flip": _mini_image_flip,
        "mini_image_patches": _mini_image_patches,
        "mini_chip_stats": _mini_chip_stats,
        "mini_audio_stats": _mini_audio_stats,
        "mini_audio_chunks": _mini_audio_chunks,
        "mini_audio_resample_stats": _mini_audio_resample_stats,
        "mini_frame_sample_stats": _mini_frame_sample_stats,
        # geospatial (rows-only: no relational analogue on these tables)
        "wit_drill": _wit_drill,
        "flagship_drill": _flagship_drill,
        "flagship_drill_cogrouped": _flagship_drill_cogrouped,
        "sum_wet_drill": _sum_wet_drill,
        "knn_points": _knn_points,
    }


# --- shared SQL fragments (DuckDB dialect) -------------------------------

_NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
_TOKS = f"string_split_regex({_NORM}, '\\s+')"
_H60 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"
_STOP = "('the','a','and','of','to','in','is','on','for','with')"
_DEC1 = "CAST(1 AS DECIMAL(18,4))"


def _dec(c):
    return f"CAST({c} AS DECIMAL(18,4))"


_REV = (f"{_dec('l_extendedprice')} * ({_DEC1} - {_dec('l_discount')})")

_EMB_COS = ("list_dot_product({a}, {b}) / "
            "(sqrt(list_dot_product({a}, {a})) * "
            "sqrt(list_dot_product({b}, {b})))")


def _kmeans_ctes(k: int, iters: int) -> str:
    """Unrolled deterministic Lloyd's k-means as chained DuckDB CTEs —
    the second-engine twin of ``similarity.kmeans_assign`` (same init =
    k smallest vec_ids, squared-euclidean, ties to the smallest cid,
    per-(cluster, dim) means 6-dp pinned each round, empty cluster keeps
    its previous centroid).  Ends at CTE ``af`` (vec_id, cid, dist)."""
    parts = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        "ev AS (SELECT vec_id, generate_subscripts(v, 1) AS pos, "
        "unnest(v) AS val FROM e)",
        f"cinit AS (SELECT v, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 "
        f"AS cid FROM (SELECT vec_id, v FROM e ORDER BY vec_id "
        f"LIMIT {k}) s)",
        "c0 AS (SELECT cid, generate_subscripts(v, 1) AS pos, "
        "unnest(v) AS val FROM cinit)",
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        parts += [
            f"d{i} AS (SELECT ev.vec_id, c.cid, "
            f"sum((ev.val - c.val) * (ev.val - c.val)) AS dist "
            f"FROM ev JOIN {prev} c USING (pos) GROUP BY 1, 2)",
            f"a{i} AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, "
            f"ROW_NUMBER() OVER (PARTITION BY vec_id "
            f"ORDER BY dist, cid) AS rk FROM d{i}) WHERE rk = 1)",
            f"m{i} AS (SELECT a.cid, ev.pos, "
            f"floor(avg(ev.val) * 1000000 + 0.5) / 1000000.0 AS val "
            f"FROM a{i} a JOIN ev ON ev.vec_id = a.vec_id GROUP BY 1, 2)",
            f"c{i} AS (SELECT p.cid, p.pos, COALESCE(m.val, p.val) AS val "
            f"FROM {prev} p LEFT JOIN m{i} m "
            f"ON m.cid = p.cid AND m.pos = p.pos)",
        ]
        prev = f"c{i}"
    parts += [
        f"df AS (SELECT ev.vec_id, c.cid, "
        f"sum((ev.val - c.val) * (ev.val - c.val)) AS dist "
        f"FROM ev JOIN {prev} c USING (pos) GROUP BY 1, 2)",
        "af AS (SELECT vec_id, cid, dist FROM (SELECT vec_id, cid, dist, "
        "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) "
        "AS rk FROM df) WHERE rk = 1)",
    ]
    return ",\n        ".join(parts)


def oracle_sql() -> dict[str, str]:
    sql = {}

    sql["q1_pricing_summary"] = f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM({_dec('l_quantity')}) AS DOUBLE) AS sum_qty,
               CAST(SUM({_dec('l_extendedprice')}) AS DOUBLE) AS sum_base_price,
               CAST(ROUND(SUM({_REV}), 4) AS DOUBLE) AS sum_disc_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """

    sql["q3_shipping_priority"] = f"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(ROUND(SUM({_REV}), 4) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """

    sql["q5_nation_revenue"] = f"""
        SELECT n_name, r_name,
               CAST(ROUND(SUM({_REV}), 4) AS DOUBLE) AS revenue,
               COUNT(DISTINCT o_orderkey) AS n_orders
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY n_name, r_name
        ORDER BY n_name
    """

    sql["monthly_order_stats"] = f"""
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               COUNT(*) AS n_orders,
               CAST(SUM({_dec('o_totalprice')}) AS DOUBLE) AS total,
               COUNT(DISTINCT o_custkey) AS n_customers
        FROM orders GROUP BY 1 ORDER BY month
    """

    sql["pivot_orderstatus"] = """
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """

    sql["bitwise_linenumber_flags"] = """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN (l_linenumber & 1) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS bit0,
               CAST(SUM(CASE WHEN (l_linenumber & 2) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS bit1,
               CAST(SUM(CASE WHEN (l_linenumber & 4) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS bit2
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """


    sql["cube_order_counts"] = f"""
        SELECT COALESCE(o_orderpriority, 'ALL') AS prio,
               COALESCE(o_orderstatus, 'ALL') AS status,
               COUNT(*) AS n,
               CAST(SUM({_dec('o_totalprice')}) AS DOUBLE) AS total
        FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """

    sql["revenue_percentiles"] = """
        SELECT o_orderpriority,
               floor(quantile_cont(o_totalprice, 0.5) * 10000 + 0.5) / 10000.0 AS p50,
               floor(quantile_cont(o_totalprice, 0.9) * 10000 + 0.5) / 10000.0 AS p90,
               floor(quantile_cont(o_totalprice, 0.99) * 10000 + 0.5) / 10000.0 AS p99
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """

    sql["topk_orders_per_customer"] = """
        SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INT) AS rnk
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey) AS rnk
              FROM orders)
        WHERE rnk <= 3
    """

    sql["day_dedup_best_events"] = """
        WITH best AS (
          SELECT user_id, event_id, ts, value FROM (
            SELECT user_id, event_id, ts, value,
                   ROW_NUMBER() OVER (
                     PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
                     ORDER BY value ASC, ts ASC, event_id) AS rn
            FROM events) WHERE rn = 1),
        wk AS (
          SELECT user_id, event_id, ts, value,
                 LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS nxt,
                 epoch_us(ts) AS cur
          FROM best)
        SELECT user_id, event_id, ts, value
        FROM wk WHERE nxt IS NULL OR nxt - cur >= 60000000
    """

    sql["event_lead_delta"] = """
        SELECT user_id, event_id, ts,
               LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) - epoch_us(ts) AS next_delta_us
        FROM events
    """

    sql["running_total_per_customer"] = f"""
        SELECT o_custkey, o_orderkey,
               CAST(SUM({_dec('o_totalprice')}) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) AS running_total
        FROM orders
    """

    sql["sessionize_events"] = """
        WITH g AS (
          SELECT user_id, event_id, ts,
                 epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS gap
          FROM events),
        s AS (
          SELECT user_id, event_id,
                 SUM(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
          FROM g),
        per AS (SELECT user_id, sess, COUNT(*) AS n FROM s GROUP BY 1, 2)
        SELECT user_id, COUNT(*) AS n_sessions,
               floor((AVG(n)) * 10000 + 0.5) / 10000.0 AS mean_session_rows
        FROM per GROUP BY user_id ORDER BY user_id
    """

    sql["asof_signup_before_purchase"] = """
        SELECT user_id, event_id, ts, last_signup_ts FROM (
          SELECT user_id, event_id, ts, event_type,
                 MAX(CASE WHEN event_type = 'signup' THEN ts END) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_signup_ts
          FROM events)
        WHERE event_type = 'purchase'
    """

    sql["range_join_error_context"] = """
        SELECT err_id, COUNT(*) AS n_prior
        FROM (SELECT user_id AS u, event_id AS err_id, ts AS err_ts
              FROM events WHERE event_type = 'error') err
        JOIN events e ON e.user_id = err.u
             AND e.ts >= err.err_ts - INTERVAL 1 HOUR
             AND e.ts < err.err_ts
        GROUP BY err_id ORDER BY err_id
    """


    sql["knn_acctbal"] = """
        SELECT c_custkey, s_suppkey, dist, CAST(rnk AS INT) AS rnk FROM (
          SELECT c_custkey, s_suppkey,
                 floor(ABS(c_acctbal - s_acctbal) * 10000 + 0.5) / 10000.0 AS dist,
                 ROW_NUMBER() OVER (PARTITION BY c_custkey
                     ORDER BY floor(ABS(c_acctbal - s_acctbal) * 10000 + 0.5) / 10000.0 ASC,
                              s_suppkey) AS rnk
          FROM customer CROSS JOIN supplier)
        WHERE rnk <= 3
    """

    sql["customers_without_orders"] = """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
    """

    sql["customers_with_orders"] = """
        SELECT c_custkey, c_acctbal FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
    """

    sql["union_distinct_keys"] = """
        SELECT DISTINCT key FROM (
          SELECT c_custkey AS key FROM customer
          UNION ALL SELECT s_suppkey AS key FROM supplier)
        ORDER BY key
    """

    sql["intersect_nation_keys"] = """
        SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
        INTERSECT
        SELECT CAST(s_nationkey AS BIGINT) AS nk FROM supplier
        ORDER BY nk
    """

    sql["orderkey_chunk_slice"] = """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem WHERE l_orderkey % 8 = 3
    """

    sql["events_json_extract"] = """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """


    from dea_conflux_spark.core.cells import morton_key_sql

    _Z = morton_key_sql("(user_id % 4096)", "(event_id % 4096)", 12)
    sql["events_zorder_blocks"] = f"""
        WITH z AS (SELECT {_Z} AS zkey FROM events)
        SELECT zkey >> 16 AS zblock, COUNT(*) AS n_events,
               MIN(zkey) AS min_zkey, MAX(zkey) AS max_zkey
        FROM z GROUP BY zblock
    """

    sql["wit_normalise_demo"] = """
        WITH f AS (
          SELECT l_orderkey, l_linenumber,
                 l_discount AS water, l_tax AS wet,
                 l_quantity % 7 AS pv,
                 CAST(l_linenumber % 5 AS DOUBLE) AS npv,
                 CAST(l_partkey % 3 AS DOUBLE) AS bs
          FROM lineitem WHERE l_orderkey % 50 = 0)
        SELECT l_orderkey, l_linenumber,
               floor((CASE WHEN pv + npv + bs != 0
                      THEN pv / (pv + npv + bs) * (1 - water - wet)
                      ELSE pv END) * 10000 + 0.5) / 10000.0 AS norm_pv,
               floor((CASE WHEN pv + npv + bs != 0
                      THEN npv / (pv + npv + bs) * (1 - water - wet)
                      ELSE npv END) * 10000 + 0.5) / 10000.0 AS norm_npv,
               floor((CASE WHEN pv + npv + bs != 0
                      THEN bs / (pv + npv + bs) * (1 - water - wet)
                      ELSE bs END) * 10000 + 0.5) / 10000.0 AS norm_bs
        FROM f
    """

    sql["doc_token_counts"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
        SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
               CAST(list_sum(list_transform(toks,
                    x -> CAST(ceil(length(x) / 4.0) AS INT))) AS BIGINT)
                 AS n_subword_pieces
        FROM t
    """

    from dea_conflux_spark.operators.textqa import SCRUB_PATTERNS

    _scrub = "pii"
    for _, _pat, _repl in SCRUB_PATTERNS:
        _p = _pat.replace("'", "''")
        _scrub = f"regexp_replace({_scrub}, '{_p}', '{_repl}', 'g')"
    sql["doc_pii_scrub"] = f"""
        WITH t AS (
          SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@example.com or https://ex.org/d/'
                      || CAST(doc_id AS VARCHAR) || ' tel 555-010-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   AS pii
          FROM documents)
        SELECT doc_id, {_scrub} AS scrubbed FROM t
    """

    sql["doc_quality_scores"] = f"""
        WITH t AS (
          SELECT doc_id, text, {_TOKS} AS toks FROM documents),
        m AS (
          SELECT doc_id,
                 CAST(length(text) AS INT) AS n_chars_m,
                 CAST(len(toks) AS INT) AS n_tokens,
                 floor((len(regexp_extract_all(text, '[.,!?;:]')) / length(text)) * 10000 + 0.5) / 10000.0 AS punct_ratio,
                 floor((len(list_filter(toks, x -> x IN {_STOP})) / len(toks)) * 10000 + 0.5) / 10000.0 AS stop_ratio,
                 floor((list_sum(list_transform(toks, x -> CAST(length(x) AS BIGINT))) / len(toks)) * 10000 + 0.5) / 10000.0 AS mean_token_len
          FROM t)
        SELECT doc_id, n_chars_m, n_tokens, punct_ratio, stop_ratio,
               mean_token_len,
               floor((least(1.0, n_tokens / 100.0) * 0.5 + stop_ratio * 0.3 + greatest(0.0, 0.2 - punct_ratio)) * 10000 + 0.5) / 10000.0 AS quality
        FROM m
    """

    # chunk_documents(chunk_tokens=64, overlap=16) -> stride 48; DuckDB
    # list slices are 1-based inclusive like Spark's slice()
    sql["doc_chunks"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        c AS (SELECT doc_id, toks,
                     unnest(generate_series(0,
                        CAST(ceil(len(toks) / 48.0) AS INT) - 1))
                       AS chunk_idx
              FROM t)
        SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
               CAST(len(toks[chunk_idx*48+1 : chunk_idx*48+64]) AS INT)
                 AS n_chunk_tokens,
               array_to_string(toks[chunk_idx*48+1 : chunk_idx*48+64],
                               ' ') AS chunk_text
        FROM c
    """

    # quality_threshold_filter(quantile=0.5, by='lang'): Spark's exact
    # percentile == DuckDB quantile_cont (parity proven by
    # revenue_percentiles), so the cutoff comparison is bit-exact
    sql["docs_quality_filter"] = f"""
        WITH t AS (SELECT doc_id, lang, text, {_TOKS} AS toks
                   FROM documents),
        m AS (
          SELECT doc_id, lang,
                 CAST(len(toks) AS INT) AS n_tokens,
                 floor((len(regexp_extract_all(text, '[.,!?;:]'))
                        / length(text)) * 10000 + 0.5) / 10000.0
                   AS punct_ratio,
                 floor((len(list_filter(toks, x -> x IN {_STOP}))
                        / len(toks)) * 10000 + 0.5) / 10000.0
                   AS stop_ratio
          FROM t),
        q AS (
          SELECT doc_id, lang,
                 floor((least(1.0, n_tokens / 100.0) * 0.5
                        + stop_ratio * 0.3
                        + greatest(0.0, 0.2 - punct_ratio))
                       * 10000 + 0.5) / 10000.0 AS quality
          FROM m),
        c AS (SELECT lang, quantile_cont(quality, 0.5) AS cut
              FROM q GROUP BY lang)
        SELECT q.doc_id, q.lang, q.quality
        FROM q JOIN c USING (lang) WHERE q.quality >= c.cut
    """

    marker = {
        "de": "('der','und','mit')", "en": "('the','and','with')",
        "es": "('el','la','con')", "fr": "('le','et','avec')",
    }
    cnt = {k: f"len(list_filter(toks, x -> x IN {v}))"
           for k, v in marker.items()}
    sql["doc_lang_id"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        c AS (SELECT doc_id,
                     CAST({cnt['de']} AS INT) AS n_de,
                     CAST({cnt['en']} AS INT) AS n_en,
                     CAST({cnt['es']} AS INT) AS n_es,
                     CAST({cnt['fr']} AS INT) AS n_fr
              FROM t)
        SELECT doc_id, n_de, n_en, n_es, n_fr,
               CASE WHEN greatest(n_de, n_en, n_es, n_fr) <= 0 THEN 'unk'
                    WHEN n_de = greatest(n_de, n_en, n_es, n_fr) THEN 'de'
                    WHEN n_en = greatest(n_de, n_en, n_es, n_fr) THEN 'en'
                    WHEN n_es = greatest(n_de, n_en, n_es, n_fr) THEN 'es'
                    ELSE 'fr' END AS pred_lang
        FROM c
    """

    # repetition signals: Spark computes the top-bigram multiplicity as a
    # longest-run scan over the sorted row-local bigram array (zero
    # shuffle); the oracle computes the same mode the relational way
    # (unnest + GROUP BY + MAX).  DuckDB's inclusive list slice
    # toks[i:i+1] truncates at the end exactly like Spark's concat_ws
    # NULL-skip, so the <n-token edge cases agree.
    sql["doc_repetition_signals"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        g AS (SELECT doc_id, toks,
                list_transform(
                  generate_series(1, greatest(len(toks) - 1, 1)),
                  i -> array_to_string(toks[i:i+1], ' ')) AS bi2,
                list_transform(
                  generate_series(1, greatest(len(toks) - 2, 1)),
                  i -> array_to_string(toks[i:i+2], ' ')) AS tri
              FROM t),
        bc AS (SELECT doc_id, MAX(cnt) AS top_bi
               FROM (SELECT doc_id, bg, COUNT(*) AS cnt
                     FROM (SELECT doc_id, unnest(bi2) AS bg FROM g)
                     GROUP BY 1, 2)
               GROUP BY 1)
        SELECT g.doc_id,
               CAST(len(toks) AS INT) AS n_tokens,
               floor((len(list_distinct(toks)) / len(toks))
                     * 10000 + 0.5) / 10000.0 AS distinct_token_frac,
               floor((top_bi / len(bi2)) * 10000 + 0.5) / 10000.0
                 AS top_bigram_frac,
               floor((1.0 - len(list_distinct(tri)) / len(tri))
                     * 10000 + 0.5) / 10000.0 AS dup_trigram_frac
        FROM g JOIN bc ON g.doc_id = bc.doc_id
    """

    h_g = _H60.format(x="g")
    sql["doc_fingerprints"] = f"""
        WITH t AS (SELECT doc_id, {_NORM} AS norm, {_TOKS} AS toks
                   FROM documents)
        SELECT doc_id, md5(norm) AS doc_md5,
               list_min(list_transform(
                 list_transform(generate_series(1, greatest(len(toks) - 3, 1)),
                                i -> array_to_string(toks[i:i+3], ' ')),
                 g -> {h_g})) AS min_gram_hash
        FROM t
    """

    h_key = _H60.format(x="CAST(doc_id AS VARCHAR)")
    sql["doc_tfidf_top_terms"] = f"""
        WITH t AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
        dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        sc AS (SELECT doc_id, term, tf, df,
                      floor((tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0))
                            * 10000 + 0.5) / 10000.0 AS tfidf
               FROM tf JOIN dfq USING (term) CROSS JOIN n)
        SELECT doc_id, term, tf, df, tfidf, CAST(rnk AS INT) AS rnk
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                  ORDER BY tfidf DESC, term) AS rnk FROM sc)
        WHERE rnk <= 3
    """

    # constants mirrored from textqa.bm25_topk: k1=1.2 b=0.75 k=10,
    # query terms textqa.BM25_QUERY_TERMS, Lucene idf, 6-dp-pinned
    # per-term contributions summed then 4-dp rounded (both engines)
    sql["doc_bm25_topk"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
        hits AS (SELECT doc_id, unnest(toks) AS term FROM t),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM hits
               WHERE term IN ('spark', 'query', 'scan') GROUP BY 1, 2),
        dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        st AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
        sc AS (SELECT tf.doc_id,
                      floor(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                            * (tf * (1.2 + 1.0)
                               / (tf + 1.2 * (1.0 - 0.75
                                              + 0.75 * dl / avgdl)))
                            * 1000000 + 0.5) / 1000000.0 AS contrib
               FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id)
               CROSS JOIN st),
        pd AS (SELECT doc_id,
                      floor(sum(contrib) * 10000 + 0.5) / 10000.0 AS score
               FROM sc GROUP BY 1)
        SELECT doc_id, score, CAST(rnk AS INT) AS rnk
        FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                    AS rnk FROM pd)
        WHERE rnk <= 10
    """

    sql["docs_top_bigrams"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        g AS (SELECT unnest(list_transform(
                generate_series(1, greatest(len(toks) - 1, 1)),
                i -> array_to_string(toks[i:i+1], ' '))) AS bigram
              FROM t)
        SELECT bigram, COUNT(*) AS n FROM g
        GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
    """

    sql["docs_split_assign"] = f"""
        SELECT doc_id, CAST({h_key} % 100 AS INT) AS bucket,
               CASE WHEN {h_key} % 100 < 90 THEN 'train'
                    WHEN {h_key} % 100 < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """

    sql["docs_stratified_sample"] = f"""
        SELECT doc_id, lang, CAST(rk AS INT) AS rk
        FROM (SELECT doc_id, lang,
                     ROW_NUMBER() OVER (PARTITION BY lang
                         ORDER BY {h_key} ASC, doc_id) AS rk
              FROM documents)
        WHERE rk <= 20
    """

    sql["docs_mixture_sample"] = f"""
        SELECT doc_id, source FROM documents
        WHERE {h_key} % 1000000 < floor(
            CASE source WHEN 'src0' THEN 1.0
                        WHEN 'src1' THEN 0.5
                        WHEN 'src2' THEN 0.25
                        ELSE 0.2 END * 1000000)
    """

    sql["docs_pack_sequences"] = f"""
        WITH t AS (
          SELECT doc_id, source,
                 CAST({h_key} % 8 AS INT) AS shard,
                 CAST(len({_TOKS}) AS BIGINT) AS n_tokens
          FROM documents
        )
        SELECT doc_id, source, shard, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source, shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS start_tok,
               CAST(floor(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source, shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) / 256) AS INT) AS seq_idx
        FROM t
    """

    # quantize_embeddings: codes from the full-precision scale, emitted
    # scale 4-dp rounded; identical IEEE ops both engines
    sql["embedding_quantize"] = """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                   FROM embeddings),
        s AS (SELECT vec_id, v,
                     list_max(list_transform(v, x -> abs(x))) / 127.0
                       AS scale
              FROM e)
        SELECT vec_id,
               floor(scale * 10000 + 0.5) / 10000.0 AS scale,
               CASE WHEN scale > 0
                    THEN list_transform(v,
                         x -> CAST(floor(x / scale + 0.5) AS INT))
                    ELSE list_transform(v, x -> 0) END AS qvec
        FROM s
    """

    sql["embedding_label_centroids"] = """
        WITH e AS (SELECT label,
                          generate_subscripts(embedding, 1) - 1 AS pos,
                          unnest(embedding::DOUBLE[]) AS val
                   FROM embeddings)
        SELECT label, CAST(pos AS INT) AS pos,
               floor(avg(val) * 10000 + 0.5) / 10000.0 AS centroid,
               COUNT(*) AS n_vecs
        FROM e GROUP BY label, pos
    """

    sql["docs_exact_dedup"] = f"""
        SELECT md5({_NORM}) AS fp, MIN(doc_id) AS keep_id,
               COUNT(*) AS n_docs
        FROM documents GROUP BY 1
    """

    sql["docs_canonical_best_quality"] = f"""
        WITH t AS (
          SELECT doc_id, text, md5({_NORM}) AS fp, {_TOKS} AS toks
          FROM documents),
        m AS (
          SELECT doc_id, fp,
                 floor((len(list_filter(toks, x -> x IN {_STOP}))
                        / len(toks)) * 10000 + 0.5) / 10000.0 AS stop_ratio,
                 floor((len(regexp_extract_all(text, '[.,!?;:]'))
                        / length(text)) * 10000 + 0.5) / 10000.0
                   AS punct_ratio,
                 CAST(len(toks) AS INT) AS n_tokens
          FROM t),
        q AS (
          SELECT doc_id, fp,
                 floor((least(1.0, n_tokens / 100.0) * 0.5
                        + stop_ratio * 0.3
                        + greatest(0.0, 0.2 - punct_ratio)) * 10000 + 0.5)
                   / 10000.0 AS quality
          FROM m),
        r AS (
          SELECT fp, doc_id, quality,
                 ROW_NUMBER() OVER (PARTITION BY fp
                     ORDER BY quality DESC, doc_id) AS rk,
                 COUNT(*) OVER (PARTITION BY fp) AS n_docs
          FROM q)
        SELECT fp, doc_id AS keep_id, quality, n_docs
        FROM r WHERE rk = 1
    """

    _SHINGLES = f"""
        t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        g AS (SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(toks) - 2, 1)),
                       i -> array_to_string(toks[i:i+2], ' '))) AS grams
              FROM t),
        s AS (SELECT doc_id, unnest(grams) AS shingle FROM g)
    """

    # max_df=64 hot-shingle cutoff mirrored from queries.py
    # 4-gram shingles (one wider than _SHINGLES' n=3) — mirrors
    # contamination_flags(n=4) in queries.docs_decontaminate
    sql["docs_decontaminate"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        s AS (SELECT doc_id, unnest(list_distinct(list_transform(
                generate_series(1, greatest(len(toks) - 3, 1)),
                i -> array_to_string(toks[i:i+3], ' ')))) AS shingle
              FROM t),
        bench AS (SELECT DISTINCT shingle FROM s WHERE doc_id % 97 = 0)
        SELECT s.doc_id, COUNT(*) AS n_hit_shingles
        FROM s JOIN bench USING (shingle)
        WHERE s.doc_id % 97 <> 0
        GROUP BY s.doc_id
    """

    sql["docs_ngram_jaccard_pairs"] = f"""
        WITH {_SHINGLES},
        sdf AS (SELECT s.doc_id, s.shingle FROM s
                JOIN (SELECT shingle FROM s GROUP BY shingle
                      HAVING COUNT(*) <= 64) ok USING (shingle)),
        sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sdf GROUP BY doc_id),
        sh AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS shared
               FROM sdf a JOIN sdf b ON a.shingle = b.shingle
                    AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
        SELECT id1, id2,
               floor((shared / (n1.n_sh + n2.n_sh - shared)) * 10000 + 0.5) / 10000.0 AS jaccard
        FROM sh
        JOIN sz n1 ON n1.doc_id = id1
        JOIN sz n2 ON n2.doc_id = id2
        WHERE floor((shared / (n1.n_sh + n2.n_sh - shared)) * 10000 + 0.5) / 10000.0 >= 0.2
    """

    h_sh = _H60.format(x="shingle")
    sql["docs_minhash_rows"] = f"""
        WITH {_SHINGLES},
        h AS (SELECT doc_id, {h_sh} % 1000000007 AS hm FROM s)
        SELECT doc_id, CAST(j AS INT) AS j,
               MIN((hm * (2 * j + 1) + 7919 * j) % 1000000007) AS mh
        FROM h CROSS JOIN generate_series(0, 15) t2(j)
        GROUP BY doc_id, j
    """


    sql["docs_minhash_lsh_pairs"] = f"""
        WITH {_SHINGLES},
        h AS (SELECT doc_id, {h_sh} % 1000000007 AS hm FROM s),
        m AS (SELECT doc_id, j,
                     MIN((hm * (2 * j + 1) + 7919 * j) % 1000000007) AS mh
              FROM h CROSS JOIN generate_series(0, 15) t2(j)
              GROUP BY doc_id, j),
        sig AS (SELECT doc_id, list(mh ORDER BY j) AS sig FROM m
                GROUP BY doc_id),
        bands AS (SELECT doc_id, b,
                         md5(b::VARCHAR || '_' ||
                             array_to_string(sig[b*4+1:b*4+4], ',')) AS bh
                  FROM sig CROSS JOIN generate_series(0, 3) t3(b)),
        cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
                 FROM bands a JOIN bands b
                   ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id),
        sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM s GROUP BY doc_id),
        sh2 AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS shared
                FROM s a JOIN s b ON a.shingle = b.shingle
                     AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
        ver AS (SELECT id1, id2,
                       floor((shared / (n1.n_sh + n2.n_sh - shared)) * 10000
                             + 0.5) / 10000.0 AS jaccard
                FROM sh2
                JOIN sz n1 ON n1.doc_id = id1
                JOIN sz n2 ON n2.doc_id = id2)
        SELECT c.id1, c.id2, v.jaccard
        FROM cand c JOIN ver v ON c.id1 = v.id1 AND c.id2 = v.id2
        WHERE v.jaccard >= 0.2
    """

    h_tok = _H60.format(x="tok")
    _SIMHASH = f"""
        tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
        hh AS (SELECT doc_id, {h_tok} AS h FROM tok),
        p AS (SELECT doc_id, j,
                     SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS c
              FROM hh CROSS JOIN generate_series(0, 59) t2(j)
              GROUP BY doc_id, j),
        sim AS (SELECT doc_id,
                       CAST(SUM(CASE WHEN c > 0
                                THEN (CAST(1 AS BIGINT) << j)
                                ELSE 0 END) AS BIGINT) AS simhash
                FROM p GROUP BY doc_id)
    """

    sql["docs_simhash"] = f"WITH {_SIMHASH} SELECT doc_id, simhash FROM sim"

    # pigeonhole blocking mirrored from dedup.simhash_block_specs at the
    # scale-sane gate: max_hamming + 1 = 7 disjoint blocks guarantee
    # complete recall <= 6 (the h=12 configuration lives in a small-corpus
    # pytest only — at 8-9 bit blocks the candidate rate stays ~2^-8.6
    # per block per random pair)
    from dea_conflux_spark.operators.dedup import simhash_block_specs

    _blk_vals = ", ".join(f"({q}, {start}, {width})"
                          for q, start, width in simhash_block_specs(6))
    sql["docs_simhash_pairs"] = f"""
        WITH {_SIMHASH},
        bs(q, start, width) AS (VALUES {_blk_vals}),
        blk AS (SELECT doc_id, simhash, q,
                       (simhash >> start) & ((CAST(1 AS BIGINT) << width) - 1)
                         AS block
                FROM sim CROSS JOIN bs),
        cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
                        a.simhash AS s1, b.simhash AS s2
                 FROM blk a JOIN blk b ON a.q = b.q AND a.block = b.block
                      AND a.doc_id < b.doc_id)
        SELECT id1, id2, CAST(bit_count(xor(s1, s2)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(s1, s2)) <= 6
    """

    # shared graph fragment: simhash pair edges -> recursive transitive
    # closure -> per-node component minimum
    _CLOSURE = f"""
        bs(q, start, width) AS (VALUES {_blk_vals}),
        blk AS (SELECT doc_id, simhash, q,
                       (simhash >> start) & ((CAST(1 AS BIGINT) << width) - 1)
                         AS block
                FROM sim CROSS JOIN bs),
        cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
                        a.simhash AS s1, b.simhash AS s2
                 FROM blk a JOIN blk b ON a.q = b.q AND a.block = b.block
                      AND a.doc_id < b.doc_id),
        edges AS (SELECT id1 AS a, id2 AS b FROM cand
                  WHERE bit_count(xor(s1, s2)) <= 6),
        bi AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
        nodes AS (SELECT DISTINCT a AS node FROM bi),
        reach(a, b) AS (
          SELECT node, node FROM nodes
          UNION
          SELECT r.a, e.b FROM reach r JOIN bi e ON e.a = r.b
        ),
        comp AS (SELECT a AS node, MIN(b) AS component FROM reach
                 GROUP BY a)
    """

    # connected components of the pair graph: the independent check of
    # the engine's pointer-doubling min-label propagation
    # (dedup.connected_components)
    sql["docs_neardup_components"] = f"""
        WITH RECURSIVE {_SIMHASH}, {_CLOSURE}
        SELECT node, component FROM comp
    """

    # one-call corpus keep-set: components + keep-best-quality member
    sql["docs_dedup_corpus_keepset"] = f"""
        WITH RECURSIVE {_SIMHASH}, {_CLOSURE},
        t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
        m AS (
          SELECT doc_id,
                 floor((len(list_filter(toks, x -> x IN {_STOP}))
                        / len(toks)) * 10000 + 0.5) / 10000.0 AS stop_ratio,
                 floor((len(regexp_extract_all(text, '[.,!?;:]'))
                        / length(text)) * 10000 + 0.5) / 10000.0
                   AS punct_ratio,
                 CAST(len(toks) AS INT) AS n_tokens
          FROM t),
        qual AS (
          SELECT doc_id,
                 floor((least(1.0, n_tokens / 100.0) * 0.5
                        + stop_ratio * 0.3
                        + greatest(0.0, 0.2 - punct_ratio)) * 10000 + 0.5)
                   / 10000.0 AS quality
          FROM m),
        inc AS (SELECT c.node AS doc_id, c.component, qual.quality
                FROM comp c JOIN qual ON qual.doc_id = c.node),
        best AS (SELECT doc_id, component FROM (
                   SELECT doc_id, component,
                          ROW_NUMBER() OVER (PARTITION BY component
                              ORDER BY quality DESC, doc_id) AS rk
                   FROM inc) WHERE rk = 1),
        outside AS (SELECT d.doc_id, CAST(NULL AS BIGINT) AS component
                    FROM documents d
                    WHERE NOT EXISTS (SELECT 1 FROM comp
                                      WHERE comp.node = d.doc_id))
        SELECT doc_id, component FROM outside
        UNION ALL SELECT doc_id, component FROM best
    """

    # tau mirrored from queries.embedding_neardup (0.35: non-vacuous on
    # the synthetic embeddings — the gate compares real pair rows)
    cos_ab = _EMB_COS.format(a="a.v", b="b.v")
    sql["embedding_neardup"] = f"""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                   FROM embeddings)
        SELECT a.vec_id AS id1, b.vec_id AS id2,
               floor(({cos_ab}) * 10000 + 0.5) / 10000.0 AS cosine
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE floor(({cos_ab}) * 10000 + 0.5) / 10000.0 >= 0.35
    """

    # constants mirrored from queries.embedding_kmeans_assign /
    # embedding_semantic_dedup: k=4, iters=2, tau=0.35
    sql["embedding_kmeans_assign"] = f"""
        WITH {_kmeans_ctes(4, 2)}
        SELECT vec_id, CAST(cid AS INT) AS cluster,
               floor(dist * 10000 + 0.5) / 10000.0 AS dist
        FROM af
    """

    cos_xy = _EMB_COS.format(a="x.v", b="y.v")
    sql["embedding_semantic_dedup"] = f"""
        WITH {_kmeans_ctes(4, 2)},
        av AS (SELECT af.vec_id, af.cid, e.v
               FROM af JOIN e USING (vec_id)),
        dropped AS (SELECT DISTINCT x.vec_id
                    FROM av x JOIN av y
                      ON x.cid = y.cid AND y.vec_id < x.vec_id
                    WHERE floor(({cos_xy}) * 10000 + 0.5) / 10000.0
                          >= 0.35)
        SELECT a.vec_id, CAST(a.cid AS INT) AS cluster,
               (d.vec_id IS NULL) AS keep
        FROM af a LEFT JOIN dropped d ON d.vec_id = a.vec_id
    """

    cos_qv = _EMB_COS.format(a="qv", b="v")
    _ANN = f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT CAST(vec_id AS VARCHAR) AS qid, v AS qv
              FROM e WHERE vec_id < 3),
        sc AS (SELECT qid, vec_id, {cos_qv} AS cr FROM e CROSS JOIN q),
        r AS (SELECT qid, vec_id, cr,
                     ROW_NUMBER() OVER (PARTITION BY qid
                         ORDER BY cr DESC, vec_id) AS rank
              FROM sc)
        SELECT qid, vec_id, floor((cr) * 10000 + 0.5) / 10000.0 AS cosine, CAST(rank AS INT) AS rank
        FROM r WHERE rank <= 5
    """
    sql["ann_brute_topk"] = _ANN
    # full-probe IVF (nprobe = n_centroids) is exact -> same oracle
    sql["ann_ivf_topk"] = _ANN

    from dea_conflux_spark import minidrill

    # every drill execution strategy answers to the SAME second-engine
    # oracle (joined / Exchange-free cogroup / salted shuffle-hash cover)
    sql["mini_drill"] = minidrill.mini_drill_oracle_sql()
    sql["mini_drill_cogrouped"] = sql["mini_drill"]
    sql["mini_drill_salted"] = sql["mini_drill"]
    # both kNN physical strategies (broadcast index / shuffle cell join)
    # answer to the same brute-force oracle
    sql["mini_knn"] = minidrill.mini_knn_oracle_sql()
    sql["mini_knn_shuffle"] = sql["mini_knn"]
    sql["mini_wit"] = minidrill.mini_wit_oracle_sql()
    sql["mini_drill_flags"] = minidrill.mini_drill_flags_oracle_sql()
    sql["mini_poly_overlap"] = minidrill.mini_poly_overlap_oracle_sql()
    sql["mini_wofs_summary"] = minidrill.mini_wofs_summary_oracle_sql()
    sql["mini_image_stats"] = minidrill.mini_image_stats_oracle_sql()
    sql["mini_image_neardup"] = minidrill.mini_image_neardup_oracle_sql()
    sql["mini_image_resize_stats"] = (
        minidrill.mini_image_resize_stats_oracle_sql())
    sql["mini_image_histogram"] = (
        minidrill.mini_image_histogram_oracle_sql())
    sql["mini_image_flip"] = minidrill.mini_image_flip_oracle_sql()
    sql["mini_image_patches"] = (
        minidrill.mini_image_patches_oracle_sql())
    sql["mini_chip_stats"] = minidrill.mini_chip_stats_oracle_sql()
    sql["mini_audio_stats"] = minidrill.mini_audio_stats_oracle_sql()
    sql["mini_audio_chunks"] = minidrill.mini_audio_chunks_oracle_sql()
    sql["mini_audio_resample_stats"] = (
        minidrill.mini_audio_resample_stats_oracle_sql())
    sql["mini_frame_sample_stats"] = (
        minidrill.mini_frame_sample_stats_oracle_sql())

    return sql
