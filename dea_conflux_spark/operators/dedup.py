"""Document deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine near-dup.

All hot paths are native Spark expressions (explode + groupBy + joins) over
the shared deterministic ``md5i`` hash, so each operator is value-checkable
against an exact DuckDB oracle.  At scale:

* shingle explode is a narrow map; the candidate joins shuffle on the
  shingle/band/bucket key (bounded fan-out by construction — LSH bands and
  SimHash bands are fixed-width keys),
* pair verification only runs on candidates, never on the n² cross join.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F

from .textqa import ensure_spread, md5i, norm_text, round4, tokens_col

# MinHash parameters (shared with the SQL oracle — keep literal + tiny)
MH_P = 1_000_000_007
MH_NH = 16  # hash functions
MH_BAND = 4  # rows per band -> 4 bands


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup by md5 of normalised text: one row per content group
    with the canonical (min) doc_id and the duplicate count."""
    fp = F.md5(norm_text(F.col("text")))
    return (docs.select(fp.alias("fp"), "doc_id")
            .groupBy("fp")
            .agg(F.min("doc_id").alias("keep_id"),
                 F.count("*").alias("n_docs"))
            .filter(F.col("n_docs") >= 1))


def canonical_best_quality(docs: DataFrame) -> DataFrame:
    """(fp, keep_id, quality, n_docs) — one row per exact-duplicate
    cluster, keeping the member with the highest quality score (ties:
    lowest doc_id).

    The realistic corpus keep-rule: content identity groups by the md5
    fingerprint of normalised text, the survivor is chosen by the
    engine's quality heuristic rather than arrival order.  Plan: the
    fingerprint and quality expressions are row-local columns of ONE
    corpus scan (``quality_scores(keep=...)`` — no doc_id self-join),
    followed by a single hash shuffle on fp feeding the ranking window.
    ``quality`` is 4-dp-rounded (cross-engine exact), making the
    ranking deterministic."""
    from .textqa import quality_scores

    j = quality_scores(
        docs.withColumn("fp", F.md5(norm_text(F.col("text")))),
        keep=("fp",)).select("doc_id", "fp", "quality")
    w = W.partitionBy("fp").orderBy(F.col("quality").desc(), F.col("doc_id"))
    return (j.withColumn("rk", F.row_number().over(w))
            .withColumn("n_docs", F.count("*").over(W.partitionBy("fp")))
            .filter(F.col("rk") == 1)
            .select("fp", F.col("doc_id").alias("keep_id"), "quality",
                    "n_docs"))


def _shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct token n-grams.

    NB: tokens are materialised as a column FIRST — referencing the
    split() expression inside the gram lambda would re-evaluate the regex
    split once per element (no CSE inside nested higher-order functions),
    an O(tokens x split) blowup measured at ~20x on real plans."""
    tok_df = ensure_spread(docs).select(
        "doc_id", tokens_col(F.col("text")).alias("toks"))
    toks = F.col("toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]))
    return (tok_df.select("doc_id", F.explode(F.array_distinct(grams))
                          .alias("shingle")))


def _drop_hot_shingles(sh: DataFrame, max_df: int) -> DataFrame:
    """Drop shingles whose document frequency exceeds ``max_df``.

    A shingle shared by thousands of documents (stop-phrases, boilerplate)
    carries no dedup signal but funnels every sharing doc into one reducer
    of the shingle self-join — a quadratic hot-key blowup at corpus scale.
    The cutoff bounds per-shingle join fan-out at ``max_df`` docs, so the
    candidate count is <= n_shingles * max_df^2 instead of O(n_docs^2).
    """
    hot = (sh.groupBy("shingle").agg(F.count("*").alias("df"))
           .filter(F.col("df") > max_df).select("shingle"))
    return sh.join(hot, "shingle", "left_anti")


def _once(df: DataFrame) -> DataFrame:
    """Materialise ``df`` to executor block storage (lazy localCheckpoint)
    so multiple consumers — self-join sides, size aggregates, candidate
    probes — compute it ONCE instead of re-deriving the full lineage per
    consumer.

    Spark's exchange-reuse does not unify these consumers (each alias gets
    its own exchange; measured: the jaccard plan used to run the
    tokenise+shingle stage 6-8x, the hot-shingle build side once per
    consumer).  The checkpoint pays whenever several consumers would
    re-run the regex/shingle pipeline: doc-grain aggregates (sizes,
    simhash values, band hashes) AND the corpus-grain shingle table
    itself once it feeds 3+ consumers (hot-shingle build, size
    aggregates, both self-join sides — see ``_shared_shingles``; an older
    A/B that called the corpus-grain checkpoint "a wash" predates the
    max_df anti-join, which doubled the recompute multiplier).  At
    cluster scale the same role is played by a scratch-parquet /
    Iceberg-temp materialisation — executor block storage keeps it
    node-local here."""
    return df.localCheckpoint(eager=False)


def _shared_shingles(docs: DataFrame, n: int,
                     max_df: int | None) -> tuple[DataFrame, DataFrame]:
    """(raw, filtered) shingle tables, each materialised ONCE.

    ``raw`` feeds the hot-shingle build + any signature derivation;
    ``filtered`` (hot shingles dropped when ``max_df`` is set) feeds the
    size aggregates and both candidate/self-join sides.  Without this the
    most CPU-expensive stage of the dedup family — the tokenise+shingle
    regex pipeline — re-runs once per consumer (measured 4-6x on the
    jaccard/LSH plans)."""
    raw = _once(_shingles(docs, n))
    if max_df is None:
        return raw, raw
    return raw, _once(_drop_hot_shingles(raw, max_df))


def _jaccard_of_sizes(sizes: DataFrame, shared: DataFrame) -> DataFrame:
    """(id1, id2, jaccard) from a shared-shingle count table and per-doc
    shingle sizes."""
    out = (shared
           .join(sizes.withColumnRenamed("doc_id", "id1")
                 .withColumnRenamed("n_sh", "n1"), "id1")
           .join(sizes.withColumnRenamed("doc_id", "id2")
                 .withColumnRenamed("n_sh", "n2"), "id2"))
    jac = round4(F.col("shared") /
                 (F.col("n1") + F.col("n2") - F.col("shared")))
    return out.select("id1", "id2", jac.alias("jaccard"))


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3,
                        tau: float = 0.4,
                        max_df: int | None = None) -> DataFrame:
    """Near-dup pairs by token n-gram Jaccard >= tau.

    Candidate generation groups the shingle table ONCE by shingle value
    (collecting each shingle's sorted doc list) and explodes the
    ascending (id1 < id2) pairs row-locally — the same candidate set a
    shingle self-equi-join produces, for one hash aggregate instead of
    a sort-merge self-join (two corpus-scale sort+Exchange legs in the
    round-5 plan).  The document-frequency cutoff becomes a row-local
    ``size(ds) <= max_df`` filter on the grouped table (the round-5
    plan paid a separate groupBy + anti-join), and per-doc sizes over
    the filtered universe re-derive from the grouped table, so the
    tokenise+shingle pipeline runs ONCE (one checkpoint instead of
    three).  Per-shingle pair fan-out stays bounded by
    ``max_df * (max_df - 1) / 2``.

    ``max_df`` is the standard mitigation for the quadratic hot-key
    blowup a corpus-wide stop-phrase would cause; sizes are computed
    over the same filtered universe so the score stays a true Jaccard
    of the retained shingle sets; mirror the cutoff in any oracle.
    """
    grouped = _grouped_shingles(docs, n, max_df)
    sizes = _once(grouped.select(F.explode("ds").alias("doc_id"))
                  .groupBy("doc_id").agg(F.count("*").alias("n_sh")))
    shared = (grouped.select(F.explode(_pairs_from_sorted("ds")).alias("p"))
              .groupBy(F.col("p.id1").alias("id1"),
                       F.col("p.id2").alias("id2"))
              .agg(F.count("*").alias("shared")))
    return (_jaccard_of_sizes(sizes, shared)
            .filter(F.col("jaccard") >= tau))


def _pairs_from_sorted(col) -> F.Column:
    """array<struct<id1, id2>> of the ascending (id1 < id2) pairs of an
    ascending-sorted id array — the row-local equivalent of a
    self-equi-join's candidate pairs for one key group."""
    ds = F.col(col) if isinstance(col, str) else col
    return F.flatten(F.transform(
        ds, lambda x, i: F.transform(
            F.slice(ds, i + 2, F.size(ds)),
            lambda y: F.struct(x.alias("id1"), y.alias("id2")))))


def _grouped_shingles(docs: DataFrame, n: int,
                      max_df: int | None) -> DataFrame:
    """(shingle, ds array<long>) — the shingle table grouped by value,
    each row carrying the ASCENDING doc_id list, hot shingles
    (``len(ds) > max_df``) dropped.  Materialised once; feeds both the
    per-doc size aggregate and the candidate-pair explode."""
    sh = _shingles(docs, n)
    grouped = (sh.groupBy("shingle")
               .agg(F.array_sort(F.collect_list("doc_id")).alias("ds")))
    if max_df is not None:
        grouped = grouped.filter(F.size("ds") <= max_df)
    return _once(grouped)


def contamination_flags(corpus: DataFrame, bench: DataFrame,
                        n: int = 4) -> DataFrame:
    """Benchmark decontamination: (doc_id, n_hit_shingles) for every
    corpus document sharing at least one token ``n``-gram with the
    benchmark/eval set — the screen an LLM training pipeline runs so
    eval questions don't leak into training data (the published recipe
    uses 8-13-gram collision; the width is a parameter here).

    Scale shape: the eval set is tiny next to a 100 TB corpus, so its
    distinct shingle set is BROADCAST and the corpus side never
    shuffles its shingles — the plan is scan -> shingle explode ->
    broadcast-hash semi join -> partial+final count keyed by doc_id
    (hit rows only, a vanishing fraction of the corpus).  No sort, no
    corpus-wide exchange.
    """
    sh = _shingles(corpus, n)
    bsh = F.broadcast(_shingles(bench, n).select("shingle").distinct())
    return (sh.join(bsh, "shingle")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_hit_shingles")))


def minhash_signatures(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, sig array<long>) MinHash signatures: for hash j,
    ``min((a_j * (md5i(shingle) % P) + b_j) % P)`` with a_j = 2j+1,
    b_j = 7919 * j — small literal constants shared with the SQL oracle.

    Fully ROW-LOCAL: a document's shingles never leave its row — the
    distinct n-gram array maps to hashes and the MH_NH minima fold in
    one vectorised Arrow step per batch (exact integer arithmetic; the
    products stay < 2^35, far inside int64).  The round-5 plan exploded
    the shingles and re-gathered them with a corpus-wide
    collect_list shuffle before an interpreted per-element fold; the
    signature pass now has NO exchange at all (beyond ensure_spread's
    split balancing)."""
    import numpy as np

    def _sigs_fn(hs: pd.Series) -> pd.Series:
        arrs = [np.asarray(a, dtype=np.int64) for a in hs]
        if not len(arrs):
            return pd.Series(np.empty(0, dtype=object))
        n_sh = np.fromiter((len(a) for a in arrs), np.int64, len(arrs))
        flat = np.concatenate(arrs)
        offs = np.zeros(len(arrs), dtype=np.int64)
        np.cumsum(n_sh[:-1], out=offs[1:])
        sigs = np.empty((len(arrs), MH_NH), dtype=np.int64)
        for j in range(MH_NH):
            vals = (flat * (2 * j + 1) + 7919 * j) % MH_P
            sigs[:, j] = np.minimum.reduceat(vals, offs)
        return pd.Series(list(sigs))

    # asNondeterministic stops the optimizer duplicating the UDF when a
    # downstream Generate/Filter references its output (guide §4.4: a
    # posexplode's implicit size>0 filter was pushed below the spread
    # exchange, re-running the signature fold — and the tokenise regex,
    # re-evaluated per element once unmaterialised — on the single-split
    # scan; measured 150 s vs 2 s).  The function is pure; the marker
    # only pins its evaluation point.
    _sigs = F.pandas_udf(_sigs_fn, "array<long>").asNondeterministic()
    tok_df = ensure_spread(docs).select(
        "doc_id", tokens_col(F.col("text")).alias("toks"))
    toks = F.col("toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]))
    hs = F.transform(F.array_distinct(grams), lambda g: md5i(g) % MH_P)
    return tok_df.select("doc_id", _sigs(hs).alias("sig"))


def minhash_lsh_pairs(docs: DataFrame, n: int = 3,
                      tau: float = 0.4,
                      max_df: int | None = None) -> DataFrame:
    """MinHash+LSH near-dup: band the signature (MH_BAND rows/band), join on
    (band, band-hash) buckets, then verify with true n-gram Jaccard >= tau
    computed for the CANDIDATE PAIRS ONLY.

    Verification cost is O(candidate_pairs x shingles_per_doc): the pair
    list is joined to each side's shingle rows (equi-joins keyed on the
    candidate doc ids), never self-joining the shingle table on the shingle
    value — the all-pairs join LSH exists to avoid never runs.  ``max_df``
    optionally drops hot shingles from the verification universe (see
    :func:`ngram_jaccard_pairs`)."""
    _, sh = _shared_shingles(docs, n, max_df)
    sigs = minhash_signatures(docs, n)
    band_vals = F.transform(
        F.slice(F.col("sig"), F.col("band") * MH_BAND + 1, MH_BAND),
        lambda x: x.cast("string"))
    bands = (sigs.select(
        "doc_id", "sig",
        F.explode(F.sequence(F.lit(0), F.lit(MH_NH // MH_BAND - 1)))
        .alias("band"))
        .select("doc_id", "band",
                F.md5(F.concat_ws(
                    "_", F.col("band").cast("string"),
                    F.concat_ws(",", band_vals))).alias("bh")))
    # candidate pairs: ONE hash aggregate on the (band, bh) bucket key +
    # a row-local pair explode, replacing the round-5 checkpointed
    # sort-merge self-join (two sorted Exchanges of the band table);
    # materialised once — it feeds the doc-id prefilter AND the
    # shared-count join
    cand = _once(
        bands.groupBy("band", "bh")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") >= 2)
        .select(F.explode(_pairs_from_sorted("ds")).alias("p"))
        .select(F.col("p.id1").alias("id1"),
                F.col("p.id2").alias("id2")).distinct())
    # Semi-join prefilter (guide §3.2): only candidate docs' shingle rows
    # enter the verification joins and the size aggregate — the round-5
    # plan shuffled the FULL corpus shingle table twice to verify a
    # candidate set that LSH exists to keep small.  Per-doc sizes over
    # the semi-filtered table equal sizes over the full universe (the
    # semi join keeps every row of a kept doc), so the Jaccard is
    # unchanged.
    ids = (cand.select(F.col("id1").alias("doc_id"))
           .union(cand.select(F.col("id2").alias("doc_id"))).distinct())
    shc = _once(sh.join(ids, "doc_id", "left_semi"))
    sizes = shc.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # shared-shingle counts for candidate pairs only: expand each pair by
    # id1's shingles (join on id1), keep rows where id2 holds the same
    # shingle (join on (id2, shingle)) — both joins are keyed on candidate
    # ids, so cost tracks the candidate set, not the corpus pair space.
    shared = (cand
              .join(shc.select(F.col("doc_id").alias("id1"), "shingle"),
                    "id1")
              .join(shc.select(F.col("doc_id").alias("id2"), "shingle"),
                    ["id2", "shingle"])
              .groupBy("id1", "id2").agg(F.count("*").alias("shared")))
    return (_jaccard_of_sizes(sizes, shared)
            .filter(F.col("jaccard") >= tau))


def simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash long): 60-bit SimHash over tokens (term frequency
    weighted).  Bit j is set iff the signed count of tokens with hash bit j
    set is positive — equivalently (since every token contributes +1 or
    -1) iff tokens-with-bit-set outnumber half the tokens:
    ``2 * popcount_j > n_tokens``.

    Plan shape: token hashes are computed ROW-LOCALLY (``transform`` over
    the token array — the shared ``md5i`` arithmetic, so the DuckDB
    oracle is unchanged) and the 60 per-bit counts are folded in ONE
    vectorised Arrow batch step (flatten the batch's hash lists, one
    (tokens x 60) bit unpack, segment-sum via ``np.add.reduceat``).
    Exact integer arithmetic end to end.  The round-5 plan instead
    exploded every token 60-fold and pushed tokens x 60 rows (~60M at
    sf1.0, ~120M at the 100k-doc point) through a two-level hash
    aggregate — two corpus-scale Exchanges that this formulation removes
    entirely: simhash is now a narrow per-row map over the scan (plus
    ``ensure_spread``'s split-balancing repartition when the scan is
    under-split)."""
    import numpy as np

    def _fold_bits_fn(hs: pd.Series) -> pd.Series:
        arrs = [np.asarray(a, dtype=np.uint64) for a in hs]
        n = np.fromiter((len(a) for a in arrs), np.int64, len(arrs))
        if not len(arrs):
            return pd.Series(np.empty(0, dtype=np.int64))
        flat = np.concatenate(arrs)
        shifts = np.arange(60, dtype=np.uint64)
        bits = ((flat[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
        offs = np.zeros(len(arrs), dtype=np.int64)
        np.cumsum(n[:-1], out=offs[1:])
        cnt = np.add.reduceat(bits, offs, axis=0)  # (docs, 60) popcounts
        mask = (2 * cnt) > n[:, None]
        sim = (mask.astype(np.uint64) << shifts).sum(axis=1)
        return pd.Series(sim.astype(np.int64))

    # asNondeterministic: pin the evaluation point so downstream
    # Generates/Filters can't duplicate the UDF below the spread
    # exchange (guide §4.4; see minhash_signatures)
    _fold_bits = F.pandas_udf(_fold_bits_fn, "long").asNondeterministic()
    d = ensure_spread(docs).select(
        "doc_id", tokens_col(F.col("text")).alias("toks"))
    hs = F.transform(F.col("toks"), lambda t: md5i(t))
    return d.select("doc_id", _fold_bits(hs.alias("hs")).alias("simhash"))


def simhash_block_specs(max_hamming: int, n_bits: int = 60) -> list:
    """(q, start, width) block layout for complete recall at
    ``max_hamming``: pigeonhole needs ``max_hamming + 1`` disjoint blocks —
    a pair differing in <= h bits leaves at least one of h+1 blocks
    untouched.  Widths are the balanced integer split of ``n_bits``."""
    nb = max_hamming + 1
    edges = [q * n_bits // nb for q in range(nb + 1)]
    return [(q, edges[q], edges[q + 1] - edges[q]) for q in range(nb)]


def simhash_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash: block on ``max_hamming + 1`` disjoint bit
    ranges of the 60-bit hash (pigeonhole — any pair within hamming
    distance <= max_hamming collides on at least one block, so recall is
    complete at the threshold), verify with exact popcount of the XOR.

    Scale note: smaller blocks collide more often on unrelated hashes, so
    the candidate rate grows with ``max_hamming`` (width 60/(h+1) bits →
    ~2^-(60/(h+1)) collision probability per block per random pair).  At
    corpus scale keep the threshold tight (h <= 6 for 60-bit hashes) or
    pre-partition by a coarse key; the blocking stays recall-complete
    either way."""
    # simhash itself is row-local since round 6, but the block table
    # still materialises once (_once) to feed both self-join sides.  The
    # candidate stage stays a streaming equi-join: simhash blocks are
    # 8-9 bits wide, so bucket occupancy is corpus_size / 2^width — far
    # beyond any per-row explode budget (a grouped collect_list +
    # row-local C(df,2) pair explode, which works well for max_df-capped
    # shingles, was measured 6x SLOWER here at the 100k-doc point: a few
    # thousand-doc buckets each built multi-million-element pair arrays
    # inside one task, where the join streams them).
    sh = _once(simhash(docs))
    blk = F.explode(F.array(*[
        F.struct(
            F.lit(q).alias("q"),
            F.expr(f"shiftrightunsigned(simhash, {start})")
            .bitwiseAND((1 << width) - 1).alias("block"))
        for q, start, width in simhash_block_specs(max_hamming)]))
    blocks = sh.select("doc_id", "simhash", blk.alias("b")).select(
        "doc_id", "simhash",
        F.col("b.q").alias("q"), F.col("b.block").alias("block"))
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (a.join(b, (F.col("a.q") == F.col("b.q"))
                   & (F.col("a.block") == F.col("b.block"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("id1"),
                    F.col("b.doc_id").alias("id2"),
                    F.col("a.simhash").alias("s1"),
                    F.col("b.simhash").alias("s2")).distinct())
    ham = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2")))
    return (cand.select("id1", "id2", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


def embedding_neardup_pairs(embeddings: DataFrame,
                            tau: float = 0.95) -> DataFrame:
    """Embedding-cosine near-dup within each label block (label blocking
    bounds the pair fan-out; at scale the block key would be an LSH bucket,
    see similarity.lsh_topk)."""
    e = embeddings.select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    a, b = e.alias("a"), e.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    nrm = lambda side: F.sqrt(F.aggregate(  # noqa: E731
        F.col(f"{side}.v"), F.lit(0.0), lambda acc, x: acc + x * x))
    cos = round4(dot / (nrm("a") * nrm("b")))
    return (a.join(b, (F.col("a.label") == F.col("b.label"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(F.col("a.vec_id").alias("id1"),
                    F.col("b.vec_id").alias("id2"),
                    cos.alias("cosine"))
            .filter(F.col("cosine") >= tau))


def _local_contract(edges: DataFrame) -> DataFrame:
    """Partition-local union-find contraction — the classic first phase
    of two-phase distributed CC: ONE ``mapInPandas`` pass (no shuffle)
    replaces each partition's edges by that partition's spanning STAR
    (one ``(node, local_root)`` edge per distinct node), which preserves
    connectivity exactly while (a) collapsing each within-partition
    clique of k nodes from k(k-1)/2 edges to k star edges and (b)
    resetting every within-partition chain to depth 1.  Near-dup pair
    graphs are clique-heavy, so the iterative min-label rounds then run
    over a smaller, shallower graph.  At the 100k-doc bench point this
    is wall-time NEUTRAL (per-round scheduling overhead dominates, not
    edge volume); the payoff is at edge-heavy scale, where LSH pair
    graphs carry 10-100x more edges than nodes and the per-round
    neighbour-join shuffle input shrinks to <= one star edge per node.
    State is one dict entry per distinct node IN THE PARTITION, bounded
    by the edge partition size (maxPartitionBytes), not the graph
    size."""

    def run(batches):
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for pdf in batches:
            for a, b in zip(pdf["a"].values, pdf["b"].values):
                a, b = int(a), int(b)
                if a not in parent:
                    parent[a] = a
                if b not in parent:
                    parent[b] = b
                ra, rb = find(a), find(b)
                if ra != rb:
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
        import numpy as np
        import pandas as pd

        nodes = np.fromiter(parent.keys(), dtype=np.int64,
                            count=len(parent))
        roots = np.fromiter((find(int(n)) for n in nodes),
                            dtype=np.int64, count=len(nodes))
        yield pd.DataFrame({"a": nodes, "b": roots})

    return edges.mapInPandas(run, schema="a long, b long")


def _cc_scratch_base(spark) -> str:
    """Default spill base for :func:`connected_components` when the caller
    gives no ``scratch_dir``: the session checkpoint dir if one is set
    (reachable by every executor — the cluster-safe choice), else a
    driver-local temp dir, which is only valid when every executor shares
    the driver's filesystem (``local[*]``) — any other master raises.
    Either way the dir is removed at process exit (it backs the returned
    DataFrame, so it must outlive the call)."""
    import atexit
    import shutil
    import tempfile
    import uuid

    ckpt = spark.sparkContext.getCheckpointDir()
    if ckpt:
        base = f"{ckpt.rstrip('/')}/cc_labels_{uuid.uuid4().hex[:12]}"
        # best-effort: only meaningful when the checkpoint dir is a
        # local/shared posix path visible from the driver
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        return base
    if not spark.sparkContext.master.startswith("local"):
        raise ValueError(
            "connected_components needs a spill location reachable by all "
            "executors: call sc.setCheckpointDir(...) or pass scratch_dir "
            f"(driver-local /tmp is wrong for master="
            f"{spark.sparkContext.master})")
    base = tempfile.mkdtemp(prefix="cc_labels_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    return base


def connected_components(pairs: DataFrame, max_iter: int = 10,
                         strict: bool = True,
                         scratch_dir: str | None = None) -> DataFrame:
    """(node, component) — connected components of the near-dup pair graph
    by min-label propagation with pointer doubling.

    Each round is (1) one neighbour-min pass over the edges and (2)
    ``ceil(log2(n_nodes))`` pointer-jump passes over the LABEL table
    (``component <- label(component)`` — the path-halving step of
    published log-round CC algorithms, e.g. large-star/small-star): the
    label functional graph always points at smaller node ids, so each jump
    doubles the compressed path length and a duplicate chain of any depth
    collapses in one round instead of O(diameter) rounds.  Label-table
    joins are much narrower than the edge join, so the extra passes cost
    little; total shuffle rounds are O(log n) worst case.

    If the loop exhausts ``max_iter`` while labels are still changing, the
    labels are NOT a fixed point — with ``strict`` (default) that raises
    instead of silently returning split components; pass ``strict=False``
    to accept the partial labelling.

    Used to resolve transitive duplicate groups exactly where
    ``dedup_keep_canonical``'s clique assumption would over/under-drop.

    Iteration-safety plumbing (both found the hard way):

    * each pointer jump SELF-joins the evolving label table; without the
      per-jump lazy lineage truncation the logical plan doubles per jump
      (2^n_jumps copies) and Catalyst analysis explodes exponentially;
    * ``localCheckpoint`` PRESERVES the origin plan's size statistics,
      and a self-join SQUARES sizeInBytes — so the stat's bit-length
      doubles per jump and Catalyst ends up multiplying million-bit
      BigIntegers by round 3 (observed: 100 s of driver CPU inside
      BigInteger.multiply).  Labels therefore spill to PARQUET at each
      round boundary (the PeriodicCheckpointer pattern of iterative
      Spark algorithms): the scan's statistics reset to the real file
      size, bounding the within-round growth at n_jumps doublings of a
      ~20-bit number.

    Each round runs exactly ONE action: the convergence probe is an
    ``observe`` metric (count of labels that changed this round) folded
    into the spill write, not a separate join-and-count over the label
    table.

    Spill location: ``scratch_dir`` if given, else the session's
    checkpoint dir (``sc.setCheckpointDir`` — the cluster-safe choice:
    every executor must reach the path), else a driver-local temp dir
    (fine for ``local[*]``; on a multi-node master this raises).
    Superseded rounds are deleted as soon as replaced; the final round's
    parquet backs the returned DataFrame, so it is kept until process
    exit and then removed by an ``atexit`` hook (skipped when the caller
    supplied ``scratch_dir`` — caller-owned lifecycle).
    """
    import math
    import shutil
    import tempfile

    # materialise the (possibly expensive) pair lineage ONCE: the edge
    # table is re-read every round by the neighbour-min join, and without
    # this an LSH/SimHash candidate pipeline upstream would re-execute
    # per round.  The partition-local union-find contraction pre-pass
    # (no shuffle, see :func:`_local_contract`) replaces raw pair edges
    # by per-partition spanning stars before the iterative rounds.
    und = _local_contract(
        pairs.select(F.col("id1").alias("a"), F.col("id2").alias("b")))
    edges = (und.union(und.select(F.col("b").alias("a"),
                                  F.col("a").alias("b")))
             .localCheckpoint(eager=True))
    labels = (edges.select(F.col("a").alias("node"))
              .union(edges.select(F.col("b").alias("node")))
              .distinct()
              .withColumn("component", F.col("node"))
              .localCheckpoint(eager=True))
    n_nodes = labels.count()
    # Jumps per round are CAPPED: ceil(log2(n_nodes)) jumps guarantee any
    # chain collapses within one round, but each jump is a self-join
    # (shuffle + lazy-checkpoint materialisation) and real near-dup
    # graphs have short label chains — 4 jumps give 16x path compression
    # per round and leftover chains simply roll into the next outer
    # round (the observed ``changed`` count keeps the convergence check
    # exact, and ``strict`` still catches a truly pathological graph at
    # max_iter).  Measured at the 100k-doc point this cut the per-round
    # shuffle count ~3.5x.
    import os

    # 3 jumps/round measured fastest at the 100k-doc point (8x path
    # compression per round; 4 jumps paid more per-jump planning +
    # shuffle than the extra compression saved, 2 converged slower) —
    # env-tunable for graphs with deeper label chains at cluster scale
    n_jumps = min(int(os.environ.get("SPARK_GRAFT_CC_JUMPS", "3")),
                  max(1, math.ceil(math.log2(max(2, n_nodes)))))
    spark = pairs.sparkSession
    base = scratch_dir or _cc_scratch_base(spark)
    prev_spill = None
    changed = 0
    for rnd in range(max_iter):
        # candidate labels: own label plus the minimum neighbour label;
        # the round's starting label rides along as old_component so the
        # convergence probe needs no second join against the old table
        neigh = (edges.join(labels, edges.b == labels.node)
                 .groupBy(F.col("a").alias("node"))
                 .agg(F.min("component").alias("nbr_min")))
        new_labels = (labels.join(neigh, "node", "left")
                      .select("node",
                              F.col("component").alias("old_component"),
                              F.least("component",
                                      F.coalesce("nbr_min", "component"))
                              .alias("component")))
        # pointer doubling: component <- label(component).  Labels only
        # ever point at smaller ids, so l(l(x)) <= l(x) and each jump
        # doubles the distance covered along the label chain — log2(n)
        # jumps exhaust any chain the neighbour pass created.  Each jump
        # SELF-joins the evolving label table, i.e. references it twice:
        # without the per-jump lineage truncation below the logical plan
        # doubles per jump (2^n_jumps copies of the base plan) and
        # Catalyst analysis time explodes exponentially — the lazy
        # checkpoint keeps the plan O(1) per jump and materialises each
        # jump's table exactly once when the round executes.
        for _j in range(n_jumps):
            lk = new_labels.select(F.col("node").alias("_cn"),
                                   F.col("component").alias("_cc"))
            new_labels = (new_labels
                          .join(lk, new_labels.component == lk._cn, "left")
                          .select("node", "old_component",
                                  F.coalesce("_cc", "component")
                                  .alias("component"))
                          .localCheckpoint(eager=False))
        # spill = the round's single action: the (1 + n_jumps)-join
        # lineage executes once, the parquet scan resets the size
        # statistics (see docstring), and the convergence probe rides the
        # same pass as an observed metric instead of a second
        # join-and-count action.  Previous rounds' spills are dropped as
        # soon as superseded.
        from pyspark.sql import Observation

        obs = Observation(f"cc_round{rnd}")
        spill = f"{base}/round{rnd}"
        (new_labels
         .observe(obs, F.sum((F.col("component") != F.col("old_component"))
                             .cast("long")).alias("n_changed"))
         .select("node", "component")
         .write.mode("overwrite").parquet(spill))
        changed = int(obs.get["n_changed"] or 0)
        labels = spark.read.parquet(spill)
        if prev_spill:
            shutil.rmtree(prev_spill, ignore_errors=True)
        prev_spill = spill
        if changed == 0:
            break
    if changed != 0:
        msg = (f"connected_components did not converge in {max_iter} "
               "min-propagation rounds (component diameter exceeds "
               "max_iter); labels are not a fixed point")
        if strict:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, stacklevel=2)
    return labels


def dedup_corpus_near(docs: DataFrame, pairs: DataFrame,
                      scratch_dir: str | None = None) -> DataFrame:
    """End-to-end near-duplicate corpus dedup: resolve the pair graph
    into TRANSITIVE components (:func:`connected_components`) and keep,
    per component, the highest-quality member (ties: lowest doc_id) —
    every document outside any component survives untouched.

    Returns ``(doc_id, component)`` for the keep-set, ``component`` NULL
    for documents with no near-duplicate.  This is the one-call corpus
    keep-set a training-data pipeline applies before tokenisation: the
    pair stage bounds candidates (LSH/SimHash blocking), the component
    stage makes the drop decision transitive (a~b, b~c drops both b and
    c even when a~c was never scored), and the quality ranking keeps the
    best exemplar rather than the first-seen."""
    from .textqa import quality_scores

    labels = connected_components(pairs, scratch_dir=scratch_dir)
    q = quality_scores(docs).select("doc_id", "quality")
    j = labels.join(q, labels.node == q.doc_id).select(
        "doc_id", "component", "quality")
    w = W.partitionBy("component").orderBy(F.col("quality").desc(),
                                           F.col("doc_id"))
    best = (j.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1).select("doc_id", "component"))
    outside = (docs.join(labels, docs.doc_id == labels.node, "left_anti")
               .select("doc_id", F.lit(None).cast("long").alias("component")))
    return outside.unionByName(best)


def dedup_keep_canonical(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Resolve near-dup pairs into a keep-set: drop every doc that appears
    as the larger id in a pair (union-find-free approximation that is exact
    when duplicate groups are cliques, which LSH verification yields)."""
    drop = pairs.select(F.col("id2").alias("doc_id")).distinct()
    return docs.join(drop, "doc_id", "left_anti")
