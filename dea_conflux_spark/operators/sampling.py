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

from .textqa import md5i, tokens_col


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


def mixture_sample(docs: DataFrame, rates: dict[str, float],
                   default_rate: float = 1.0, key_col: str = "doc_id",
                   group_col: str = "source") -> DataFrame:
    """(key, group) — deterministic corpus-mixture downsampling: keep
    each row of group *g* with probability ``rates.get(g,
    default_rate)``, decided by a pure hash of the row key — the
    reweighting step that turns raw crawls into a training mixture
    (e.g. web 10%, wiki 100%, books 50%).

    ``keep = md5i(key) % 1e6 < floor(rate * 1e6)``: a row-local filter
    over the scan — no shuffle, no RNG state — so the same document is
    kept or dropped identically on every rerun, at every parallelism,
    and in every downstream pipeline that re-derives the mixture.
    Integer thresholds sidestep float-comparison ambiguity between
    engines.
    """
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {g!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    mapping = F.create_map(
        *[F.lit(v) for kv in rates.items() for v in kv])
    rate = F.coalesce(mapping[F.col(group_col)],
                      F.lit(float(default_rate)))
    u = md5i(F.col(key_col).cast("string")) % 1000000
    return (docs.filter(u < F.floor(rate * 1000000))
            .select(key_col, group_col))


def pack_sequences(docs: DataFrame, budget: int = 256,
                   n_shards: int = 8, group_col: str = "source",
                   key_col: str = "doc_id") -> DataFrame:
    """(doc_id, source, shard, n_tokens, start_tok, seq_idx) —
    deterministic training-sequence packing: concatenate documents in a
    stable order and assign each one to the fixed-token-budget sequence
    its first token lands in (``seq_idx = floor(start_tok / budget)``,
    long docs spanning multiple sequences keep their starting index).

    Real pipelines pack per output shard, not globally — a single
    global running sum would funnel the corpus through one reducer.
    Here each (group, shard) packs independently, with the shard a pure
    hash of the key (``md5i(key) % n_shards``): the plan is one window
    cumsum per (group, shard) partition, parallel across
    ``groups x n_shards`` reducers and reproducible across cluster
    sizes and row order.  Token counts use the shared whitespace
    tokenizer (``textqa.tokens_col``) so the SQL oracle is exact.
    """
    ntok = F.size(tokens_col(F.col("text"))).cast("long")
    shard = (md5i(F.col(key_col).cast("string")) % n_shards).cast("int")
    d = docs.select(F.col(key_col), F.col(group_col),
                    shard.alias("shard"), ntok.alias("n_tokens"))
    w = (W.partitionBy(group_col, "shard").orderBy(key_col)
         .rowsBetween(W.unboundedPreceding, -1))
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (d.withColumn("start_tok", start)
            .withColumn("seq_idx",
                        F.floor(F.col("start_tok") / budget).cast("int")))


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
