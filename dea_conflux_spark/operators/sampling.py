"""Deterministic sampling / splitting operators for the training-data
pipeline surface.

Reproducible subsetting is the backbone of any corpus pipeline: train/val/
test assignment must be a pure function of the row key (stable across
reruns, cluster sizes and row order), and per-stratum sampling must not
depend on partitioning.  Everything here keys on the shared 60-bit
``md5i`` hash (``textqa.md5i``), which Spark and DuckDB compute
identically — so every operator has an exact SQL oracle.

All expressions are native ``pyspark.sql.functions`` (JVM, codegen): a
hash + modulo split is a narrow map over the scan (no shuffle at all),
and the per-stratum sampler is one ranking window keyed on the stratum —
both plans scale to arbitrarily many rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .textqa import md5i


def split_assign(df: DataFrame, key_col: str = "doc_id",
                 train_pct: int = 90, val_pct: int = 5) -> DataFrame:
    """(key, bucket, split) — deterministic hash split into
    train/val/test.

    ``bucket = md5i(key) % 100``; rows with bucket < ``train_pct`` are
    'train', the next ``val_pct`` buckets are 'val', the rest 'test'.
    Assignment is a pure row-local expression: no shuffle, no RNG state,
    identical on every rerun and at every parallelism — the property that
    makes held-out sets trustworthy when the corpus is re-ingested.
    """
    if not (0 <= train_pct and 0 <= val_pct and train_pct + val_pct <= 100):
        raise ValueError(
            f"train_pct + val_pct must fit in [0, 100], got "
            f"{train_pct} + {val_pct}")
    bucket = (md5i(F.col(key_col).cast("string")) % 100).cast("int")
    split = (F.when(F.col("bucket") < train_pct, "train")
             .when(F.col("bucket") < train_pct + val_pct, "val")
             .otherwise("test"))
    return (df.select(key_col, bucket.alias("bucket"))
            .withColumn("split", split))


def stratified_sample(df: DataFrame, strata: list[str],
                      per_stratum: int, key_col: str = "doc_id") -> DataFrame:
    """Deterministic fixed-size sample per stratum: the ``per_stratum``
    rows of each strata-combination with the smallest ``md5i(key)``.

    Equivalent to a seeded reservoir sample but order- and
    partition-independent (the hash IS the random tape), so the sample is
    reproducible across cluster sizes.  With few strata a naive ranking
    window would funnel every row of a stratum through one reducer; the
    ``row_number() <= k`` shape lets Spark insert a PARTIAL
    WindowGroupLimit below the exchange (plan-verified), so each map task
    forwards at most ``per_stratum`` rows per stratum and the shuffle
    carries O(k x tasks), not the corpus.
    """
    hk = md5i(F.col(key_col).cast("string"))
    w = W.partitionBy(*strata).orderBy(hk.asc(), F.col(key_col))
    return (df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= per_stratum)
            .select(key_col, *strata, "rk"))
