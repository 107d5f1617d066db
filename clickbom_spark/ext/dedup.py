"""Deduplication operators: exact, fingerprint, n-gram Jaccard,
MinHash+LSH, SimHash.

Scale design (the whole point of these implementations):

- exact/fingerprint dedup: one hash-shuffle on the key — the same
  dropDuplicates machinery as the SBOM dedup (U2), linear at any scale.
- n-gram Jaccard all-pairs: O(n²) — correct but only for corpus-sized
  inputs; it is the *oracle* the scalable paths are validated against.
- MinHash+LSH: the 100 TB path.  k seeded 64-bit min-hashes per doc;
  b bands of r rows hashed to bucket keys; candidate generation is an
  equi-join on (band, bucket) — a shuffle join on a well-distributed
  key, no cross product anywhere; candidates are verified with exact
  Jaccard.  Cost: O(n·k) hashing + O(candidates) verification.
- SimHash: one 64-bit signature per doc via weighted bit-votes over
  token hashes; near-dup = small Hamming distance.  Banding over
  16-bit chunks gives the same join-not-crossproduct property.

Everything is built-in expressions (xxhash64, bitwise ops, array
functions) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clickbom_spark.ext.text import fan_out, normalize_text, shingles, tokens


#: Inputs larger than this may not take an O(n²) all-pairs oracle path.
ORACLE_MAX_ROWS = 50_000


def guard_oracle_size(df: DataFrame, op: str, scale_twin: str) -> DataFrame:
    """Refuse to run an O(n²) oracle-path operator on at-scale input.

    The all-pairs operators exist to validate their LSH/IVF scale twins
    and would melt a cluster on real corpora; this counts at most
    ORACLE_MAX_ROWS+1 rows (a bounded scan, not a full count) and fails
    fast with a pointer to the scale path.
    """
    n = df.limit(ORACLE_MAX_ROWS + 1).count()
    if n > ORACLE_MAX_ROWS:
        raise ValueError(
            f"{op} is the O(n²) oracle path and refuses inputs over "
            f"{ORACLE_MAX_ROWS} rows (got >{ORACLE_MAX_ROWS}); use "
            f"{scale_twin} at scale"
        )
    return df


def exact_dedup(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact duplicate removal on a column set (hash-shuffle keep-first)."""
    return df.dropDuplicates(cols)


def add_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    from clickbom_spark.ext.text import fingerprint

    return df.withColumn("fingerprint", fingerprint(F.col(text_col)))


def fingerprint_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Near-exact dedup: normalize → md5 → keep one row per digest."""
    return add_fingerprint(df, text_col).dropDuplicates(["fingerprint"])


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays, as double."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def _jaccard_sized(grams_a: Column, grams_b: Column, sz_a: Column, sz_b: Column) -> Column:
    """Jaccard with precomputed set sizes: |A∪B| = |A|+|B|-|A∩B|, so one
    array_intersect per evaluation instead of intersect+union (these
    hash-set builds dominate the all-pairs path)."""
    inter = F.size(F.array_intersect(grams_a, grams_b)).cast("double")
    denom = sz_a.cast("double") + sz_b.cast("double") - inter
    return F.when(denom > 0, inter / denom).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """All-pairs exact n-gram Jaccard (the O(n²) reference/oracle path).

    Returns (id_a, id_b, jac) for id_a < id_b with jac >= threshold.
    Size-guarded: refuses inputs over ORACLE_MAX_ROWS — the scale path
    is minhash_lsh_pairs.
    """
    df = guard_oracle_size(df, "ngram_jaccard_pairs", "minhash_lsh_pairs")
    g = fan_out(df).select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("grams")
    ).withColumn("sz", F.size("grams"))
    a = g.select(
        F.col("id").alias("id_a"), F.col("grams").alias("grams_a"), F.col("sz").alias("sz_a")
    )
    b = g.select(
        F.col("id").alias("id_b"), F.col("grams").alias("grams_b"), F.col("sz").alias("sz_b")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    jac = _jaccard_sized(
        F.col("grams_a"), F.col("grams_b"), F.col("sz_a"), F.col("sz_b")
    )
    return pairs.select("id_a", "id_b", jac.alias("jac")).where(
        F.col("jac") >= threshold
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    n: int = 3,
) -> DataFrame:
    """k seeded min-hashes per document, as one array<bigint> column.

    hash_i(shingle) = xxhash64(i, shingle); sig[i] = min over the
    doc's shingle set.  Fully deterministic (no RNG), fully JVM-side.
    A single nested higher-order expression (not k separate columns):
    k column-expressions would make the analyzed plan O(k·|expr|) and
    Catalyst analysis itself becomes the bottleneck.

    The shingle set is LET-BOUND outside the per-seed lambda: Catalyst's
    CollapseProject inlines column references, and a plain
    ``F.col("grams")`` inside ``transform(sequence(0,k-1), ...)`` would
    re-evaluate the whole tokenize+shingle pipeline once per seed
    (measured 30×+ slowdowns).
    """
    from clickbom_spark.ext.text import let

    def sig_of(h0: Column) -> Column:
        # h0 = xxhash64(shingle) computed ONCE per shingle; the k seeded
        # hashes re-hash the 8-byte value, not the string — string
        # hashing is the dominant cost and this does it 1× instead of k×.
        return F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda i: F.array_min(F.transform(h0, lambda h: F.xxhash64(i, h))),
        )

    g = fan_out(df).select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("grams")
    )
    return g.select(
        "id",
        "grams",
        let(
            F.transform(F.col("grams"), lambda s: F.xxhash64(s)), sig_of
        ).alias("sig"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash + LSH banding near-dup detection (the scale path).

    8 bands × 4 rows: P[candidate] = 1-(1-j^4)^8 ≈ 0.985 at j=0.8,
    0.9998 at j=0.9 — and the hash family is deterministic (seeded
    xxhash64), so observed recall on a given corpus is reproducible.

    signatures → per-band bucket keys → equi-self-join on (band,
    bucket) for candidates → exact-Jaccard verification.  Returns
    (id_a, id_b, jac) with jac >= threshold.

    Banding is one explode over an array of (band, bucket) structs —
    NOT a union of per-band plans, which would duplicate the whole
    signature expression tree per band.  The posting list carries only
    (id, band, bucket): shipping each doc's shingle array through the
    8×-exploded shuffle would dominate the stage; instead the (far
    smaller) deduped candidate set joins the shingle table back by id
    for verification.
    """
    banded = minhash_band_postings(
        df, id_col, text_col, num_hashes, bands, n
    )
    a = banded.select(F.col("id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("id").alias("id_b"), "band", "bucket")
    cands = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return verify_jaccard_pairs(df, cands, id_col, text_col, n, threshold)


def minhash_band_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
) -> DataFrame:
    """The LSH posting list: (id, band, bucket) rows, ``bands`` per
    document.  This IS the standing near-dup index a 100 TB pipeline
    persists — postings are tiny (3 longs × bands per doc), fully
    deterministic (seeded xxhash64, no RNG), and mergeable by plain
    union, which is what makes :func:`incremental_minhash_pairs`
    possible: new documents hash once and join the stored postings,
    the old corpus is never re-hashed."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, n)
    bandarr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
            ).alias("bucket"),
        ),
    )
    return sigs.select("id", F.explode(bandarr).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def verify_jaccard_pairs(
    df: DataFrame,
    cands: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact-Jaccard verification of a candidate pair set: join the
    (tiny) deduped candidates back to the corpus shingles by id and
    keep pairs with jac >= threshold.  Only candidate documents are
    ever re-shingled — at scale this is a point-lookup join, not a
    corpus scan.

    The candidate-id filter is applied BEFORE the shingle projection
    (broadcast semi-join on the raw (id, text) scan): a projection
    below the join would tokenize+shingle EVERY corpus document and
    discard the non-candidates after the fact — the shingle pass, not
    the join, is the dominant cost.

    ``cands`` is consumed twice by construction (the broadcast id set
    and the final pair join), and the broadcast subtree materializes
    independently of the main plan — exchange reuse does NOT bridge
    it, so an unmaterialized candidate pipeline (signatures + posting
    join) would run twice (measured 2x wall on the minhash path).
    localCheckpoint materializes the tiny id-pair frame exactly once.
    """
    cands = cands.localCheckpoint(eager=False)
    ids = (
        cands.select(F.col("id_a").alias("_cid"))
        .union(cands.select(F.col("id_b").alias("_cid")))
        .distinct()
    )
    # No fan_out here (unlike the full-corpus signature pass): the
    # semi-joined frame is candidates only — small by construction —
    # and at real scale it inherits the corpus scan's file-split
    # parallelism anyway (fan_out would no-op).  fan_out's
    # getNumPartitions probe also converts a broadcast-lineage plan
    # to an RDD, which under AQE eagerly runs the candidate pipeline
    # at query-BUILD time — measured ~0.3s per bench pass at sf0.1.
    g = (
        df.select(F.col(id_col).alias("gid"), F.col(text_col))
        .join(
            F.broadcast(ids),
            F.col("gid") == F.col("_cid"),
            "left_semi",
        )
        .select("gid", shingles(F.col(text_col), n).alias("grams"))
        .withColumn("sz", F.size("grams"))
    )
    # g is consumed twice (the id_a and id_b sides of the pair join)
    # and each side plans as an INDEPENDENT subtree — without a
    # materialization barrier the corpus scan, the candidate semi-join
    # and the shingle pass all run twice (the r14 after-plan shows two
    # full copies, operators (2)-(18) and (21)-(37)).  g is candidates
    # only — O(candidate docs) shingle arrays — so the checkpoint
    # working set is small by construction at every scale.
    g = g.localCheckpoint(eager=False)
    ga = g.select(
        F.col("gid").alias("id_a"), F.col("grams").alias("grams_a"), F.col("sz").alias("sz_a")
    )
    gb = g.select(
        F.col("gid").alias("id_b"), F.col("grams").alias("grams_b"), F.col("sz").alias("sz_b")
    )
    jac = _jaccard_sized(
        F.col("grams_a"), F.col("grams_b"), F.col("sz_a"), F.col("sz_b")
    )
    return (
        cands.join(ga, "id_a")
        .join(gb, "id_b")
        .select("id_a", "id_b", jac.alias("jac"))
        .where(F.col("jac") >= threshold)
    )


def incremental_minhash_pairs(
    index: DataFrame,
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.8,
) -> tuple[DataFrame, DataFrame]:
    """Incremental near-dup maintenance: given the persisted posting
    ``index`` of the existing corpus (from
    :func:`minhash_band_postings`) and a batch of ``new_docs``, find
    every verified pair that TOUCHES a new document — without
    re-hashing or self-joining the old corpus.

    Incremental law (pinned by test):
    ``pairs(old ∪ new) = pairs(old) ∪ incremental(old, new)`` — pairs
    among old documents were already found when those docs were new, so
    the increment only needs new×(old ∪ new) candidates: new postings
    equi-join the UNION index on (band, bucket).  Cost scales with the
    batch (new docs hashed once; candidates verified by point lookups
    into ``corpus``), not the corpus — the property that lets a 100 TB
    dedup pipeline absorb a daily drop of documents in minutes.

    Returns ``(pairs, updated_index)``; persist ``updated_index`` as
    the next round's index (plain union — postings are mergeable).
    """
    new_post = minhash_band_postings(
        new_docs, id_col, text_col, num_hashes, bands, n
    )
    all_post = index.unionByName(new_post)
    a = new_post.select(F.col("id").alias("id_x"), "band", "bucket")
    b = all_post.select(F.col("id").alias("id_y"), "band", "bucket")
    cands = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_x") != F.col("id_y"))
        .select(
            F.least("id_x", "id_y").alias("id_a"),
            F.greatest("id_x", "id_y").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs = verify_jaccard_pairs(
        corpus, cands, id_col, text_col, n, threshold
    )
    return pairs, all_post


def connected_components(
    pairs: DataFrame,
    max_iter: int = 20,
) -> DataFrame:
    """Cluster near-dup pairs into components: (id, component) where
    component = min id reachable through the pair graph.

    Iterative min-label propagation: each round every node takes the
    min of its own label and its neighbors' labels; converges in
    O(component diameter) rounds — near-dup clusters are shallow
    (diameter ≤ a few), so this is 2-4 shuffles in practice, each
    linear in |edges|.  Lineage is truncated per round
    (localCheckpoint) so the plan does not grow with iterations.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def keep_cluster_representatives(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup dedup, end to end: rows in a pair-cluster keep only the
    min-id representative; rows in no cluster pass through."""
    comps = connected_components(pairs)
    drop = comps.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


SIMHASH_BITS = 60  # 15 md5 hex digits — engine-portable (fits signed 64)


def token_hash60(t: Column) -> Column:
    """Portable 60-bit token hash: first 15 hex digits of md5.

    Identical in any engine with md5 + hex parsing (DuckDB:
    ``CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT)``), which makes
    every simhash-derived result oracle-checkable bit-for-bit — the
    reason this replaced xxhash64.
    """
    return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")


def simhash(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash signature: per-token 60-bit portable hash; each bit votes
    ±1; signature bit = sign of the vote sum.  Pure expressions.

    Single pass over the token array: the vote accumulator is an
    array<bigint>[bits] folded with zip_with, instead of one
    O(n_tokens) fold per bit (which is 60× the work and a 60×-larger
    expression tree).  shiftleft/shiftright take the bit index as a
    *column* (lambda variable), which the typed PySpark wrappers
    reject — F.call_function reaches the SQL builtin directly.
    """
    toks = tokens(normalize_text(text))
    hashes = F.transform(toks, token_hash60)
    bitseq = F.sequence(F.lit(0), F.lit(bits - 1))
    one = F.lit(1).cast("bigint")
    zero = F.lit(0).cast("bigint")

    votes = F.aggregate(
        hashes,
        F.array_repeat(zero, bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                bitseq,
                lambda b: F.when(
                    F.call_function("shiftright", h, b).bitwiseAND(F.lit(1)) == 1,
                    one,
                ).otherwise(-one),
            ),
            lambda a, v: a + v,
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            bitseq,
            lambda v, b: F.when(
                v > 0, F.call_function("shiftleft", one, b)
            ).otherwise(zero),
        ),
        zero,
        lambda acc, x: acc + x,
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 8,
) -> DataFrame:
    """SimHash near-dup pairs via multi-block blocking.

    The 60-bit signature is split into ``max_distance + 1`` blocks: two
    signatures within Hamming distance ≤ max_distance differ in at most
    max_distance blocks, so by pigeonhole they agree exactly on ≥1
    block — candidate recall is therefore EXACT (the output equals the
    all-pairs Hamming filter, which is what the DuckDB oracle computes).
    Candidates come from equi-joins on (block_idx, block_value) — no
    cross product — then exact Hamming verification for precision.
    Smaller blocks (higher max_distance) mean more bucket collisions; at
    extreme scale prefer a wider signature or a lower distance bound.
    """
    nblocks = max_distance + 1
    base, rem = divmod(SIMHASH_BITS, nblocks)
    widths = [base + 1 if i < rem else base for i in range(nblocks)]
    offsets = [sum(widths[:i]) for i in range(nblocks)]
    off_arr = F.array(*[F.lit(o) for o in offsets])
    mask_arr = F.array(*[F.lit((1 << w) - 1).cast("bigint") for w in widths])

    from clickbom_spark.ext.text import let

    def sig_and_chunks(sg: Column) -> Column:
        # sg is a lambda variable: the simhash expression evaluates ONCE
        # per row here, not once per chunk (CollapseProject would inline
        # a plain column reference into the per-chunk lambda).
        chunkarr = F.transform(
            F.sequence(F.lit(0), F.lit(nblocks - 1)),
            lambda c: F.struct(
                c.alias("chunk"),
                F.call_function("shiftright", sg, F.element_at(off_arr, c + 1))
                .bitwiseAND(F.element_at(mask_arr, c + 1))
                .alias("cval"),
            ),
        )
        return F.struct(sg.alias("sig"), chunkarr.alias("chunks"))

    s = fan_out(df).select(
        F.col(id_col).alias("id"),
        let(simhash(F.col(text_col)), sig_and_chunks).alias("sc"),
    )
    banded = s.select(
        "id", F.col("sc.sig").alias("sig"), F.explode("sc.chunks").alias("cc")
    ).select("id", "sig", F.col("cc.chunk").alias("chunk"), F.col("cc.cval").alias("cval"))
    a = banded.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "chunk", "cval")
    b = banded.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "chunk", "cval")
    return (
        a.join(b, ["chunk", "cval"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming64(F.col("sig_a"), F.col("sig_b")).alias("dist"))
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("dist") <= max_distance)
    )


def _rarity_ranked(docs, id_col: str, tokens_col: str):
    """Shared scaffold of the prefix-filter joins: distinct tokens per
    doc, global rarity order (document frequency asc, token asc), and
    the ordered token array with its size — ``(_id, w, n)``."""
    from pyspark.sql import functions as F

    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(F.col(tokens_col)).alias("_w"),
    )
    vocab = (
        toks.select(F.explode("_w").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return (
        # vocab is vocabulary-sized (grows with the corpus) — no hard
        # broadcast hint; AQE sizes the join
        toks.select("_id", F.explode("_w").alias("tok"))
        .join(vocab, "tok")
        .groupBy("_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("df", "tok"))
            ).alias("ordered")
        )
        .select(
            "_id",
            F.transform("ordered", lambda s: s["tok"]).alias("w"),
            F.size("ordered").alias("n"),
        )
    )


def _prefix_len(threshold: float):
    """prefix length = n - ceil(t*n) + 1.  ceil must not overshoot when
    the double product t*n lands epsilon ABOVE an integer (e.g. a
    threshold like 0.7 whose binary expansion rounds up): that would
    shorten the prefix by one token and silently drop qualifying
    pairs.  Nudging down by 1e-9 before the ceil keeps the bound
    lossless for any threshold with more than 1e-9 slack — ceil may
    then only land LOW, which lengthens the prefix (extra candidates,
    never missed ones)."""
    from pyspark.sql import functions as F

    return (
        F.col("n")
        - F.ceil(F.col("n") * F.lit(threshold) - F.lit(1e-9))
        + 1
    )


def setsim_join_prefix(
    docs, id_col: str, tokens_col: str, threshold: float = 0.5
):
    """EXACT Jaccard set-similarity self-join via prefix filtering.

    The scale path for exact (non-LSH) near-dup detection: any two sets
    with Jaccard >= t must share a token within the first
    ``len - ceil(t * len) + 1`` tokens of a GLOBAL rarity order
    (document frequency ascending), so candidates come from an
    equi-self-join on prefix tokens only — rare tokens generate tiny
    posting lists, and the all-pairs blow-up never happens.  Unlike
    MinHash/LSH this misses nothing: the prefix filter is lossless for
    the threshold, and every candidate is verified with the exact
    Jaccard.

    Returns (id_a, id_b, jaccard) for pairs with jaccard >= threshold.
    """
    from pyspark.sql import functions as F

    ranked = _rarity_ranked(docs, id_col, tokens_col)
    # Guide §8: the posting join only DECIDES which pairs are
    # candidates — shipping each doc's full ordered token array on
    # every posting row made the prefix shuffle O(postings × doc_len)
    # bytes.  Postings now carry (id, n, ptok) only; the arrays are
    # re-attached to the deduped candidate pairs by two id-keyed
    # joins against the materialized ranked frame (consumed 3×:
    # postings + both attach sides).
    ranked = ranked.localCheckpoint(eager=False)
    plen = _prefix_len(threshold)
    # positions ride the postings (PPJoin, Xiao et al. 2008): both
    # arrays are ordered by the SAME global rarity order, so the
    # FIRST common token of a qualifying pair sits at positions
    # (i, j) with overlap ≤ 1 + min(n_a − i, n_b − j); Jaccard ≥ t
    # needs overlap ≥ t/(1+t)·(n_a+n_b), so posting matches that
    # cannot reach that bound are dropped BEFORE the candidate dedup
    # shuffle — lossless (the first-common match of every qualifying
    # pair always survives), and it subsumes the length filter.
    prefixes = ranked.select(
        "_id",
        "n",
        F.posexplode(F.slice("w", 1, plen)).alias("_p0", "ptok"),
    )
    a = prefixes.select(
        F.col("_id").alias("id_a"), F.col("n").alias("n_a"),
        (F.col("_p0") + 1).alias("_ia"), "ptok",
    )
    b = prefixes.select(
        F.col("_id").alias("id_b"), F.col("n").alias("n_b"),
        (F.col("_p0") + 1).alias("_jb"), "ptok",
    )
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold))
        * (F.col("n_a") + F.col("n_b")).cast("double")
        - F.lit(1e-9)
    )
    bound = F.lit(1) + F.least(
        F.col("n_a") - F.col("_ia"), F.col("n_b") - F.col("_jb")
    )
    cands = (
        a.join(b, "ptok")
        .where((F.col("id_a") < F.col("id_b")) & (bound >= alpha))
        .select("id_a", "id_b", "n_a", "n_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    wa = ranked.select(F.col("_id").alias("id_a"), F.col("w").alias("w_a"))
    wb = ranked.select(F.col("_id").alias("id_b"), F.col("w").alias("w_b"))
    verify = cands.join(wa, "id_a").join(wb, "id_b")
    inter = F.size(F.array_intersect("w_a", "w_b")).cast("double")
    union = (F.col("n_a") + F.col("n_b")).cast("double") - inter
    j = inter / union
    return (
        verify.select("id_a", "id_b", j.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def containment_join_prefix(
    docs, id_col: str, tokens_col: str, threshold: float = 0.8
):
    """EXACT containment set-similarity self-join via prefix filtering:
    pairs (a, b), a ≠ b, with ``|tokens_a ∩ tokens_b| / |tokens_a| >=
    threshold`` — the ASYMMETRIC relation Jaccard misses (a short doc
    wholly contained in a long one scores high containment but low
    Jaccard), which is what sub-document / quote / boilerplate
    detection in a training corpus needs.

    Prefix bound (Chaudhuri et al. 2006 adapted to containment): if
    c(a→b) >= t then a and b share a token among the first
    ``|a| - ceil(t * |a|) + 1`` tokens of a's GLOBAL rarity order.
    Only the probe side shrinks to its prefix; the indexed side posts
    ALL tokens — but rarity ordering means probe prefixes are a's
    RAREST tokens, whose posting lists are the corpus's shortest, so
    candidates stay an equi-join on small postings, never all-pairs.
    Every candidate is verified with the exact intersection.

    Returns (id_a, id_b, containment) with containment >= threshold.
    """
    from pyspark.sql import functions as F

    ranked = _rarity_ranked(docs, id_col, tokens_col)
    # Same §8 payload/proxy split as setsim_join_prefix: the index
    # side posts EVERY token, so carrying w_b on each posting row
    # shipped each doc's array once per token — O(total_tokens ×
    # doc_len) shuffle bytes (the r15 before-plan's dominant cost).
    # Postings carry ids + n_a only; arrays re-attach after the
    # candidate dedup.
    ranked = ranked.localCheckpoint(eager=False)
    plen = _prefix_len(threshold)
    # Positional filter (same PPJoin bound as setsim_join_prefix,
    # specialized to containment): both arrays share the global
    # rarity order, so the first common token at positions (i, j)
    # bounds the overlap by 1 + min(n_a − i, n_b − j), and
    # c(a→b) ≥ t needs overlap ≥ ceil(t·n_a).  Posting matches that
    # cannot reach the bound drop before the candidate dedup —
    # lossless, and it prunes most of the index side's deep
    # positions (the index posts ALL tokens, so this is where the
    # join volume lives).
    probe = ranked.select(
        F.col("_id").alias("id_a"), F.col("n").alias("n_a"),
        F.posexplode(F.slice("w", 1, plen)).alias("_ia0", "tok"),
    )
    index = ranked.select(
        F.col("_id").alias("id_b"), F.col("n").alias("n_b"),
        F.posexplode("w").alias("_jb0", "tok"),
    )
    alpha = F.ceil(
        F.col("n_a").cast("double") * F.lit(threshold) - F.lit(1e-9)
    )
    bound = F.lit(1) + F.least(
        F.col("n_a") - F.col("_ia0") - 1, F.col("n_b") - F.col("_jb0") - 1
    )
    cands = (
        probe.join(index, "tok")
        .where((F.col("id_a") != F.col("id_b")) & (bound >= alpha))
        .select("id_a", "id_b", "n_a")
        .dropDuplicates(["id_a", "id_b"])
    )
    wa = ranked.select(F.col("_id").alias("id_a"), F.col("w").alias("w_a"))
    wb = ranked.select(F.col("_id").alias("id_b"), F.col("w").alias("w_b"))
    verify = cands.join(wa, "id_a").join(wb, "id_b")
    c = F.size(F.array_intersect("w_a", "w_b")).cast("double") / F.col(
        "n_a"
    ).cast("double")
    return (
        verify.select("id_a", "id_b", c.alias("containment"))
        .where(F.col("containment") >= threshold)
    )


def duplicate_token_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 10,
    min_count: int = 2,
) -> DataFrame:
    """Exact substring-level dedup: maximal per-document token spans
    covered by length-``window`` token windows that occur at least
    ``min_count`` times anywhere in the corpus (within OR across docs).

    This is the scale-safe analog of suffix-array substring dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better"): any repeated substring of >= ``window`` tokens
    makes every one of its length-``window`` windows repeated, so
    marking repeated windows and merging marked positions whose
    covered spans touch or overlap (gap <= window) yields exactly the
    union of repeated-substring spans (the removal set practitioners
    cut), as maximal contiguous runs.  No suffix array and no cross
    product:

    1. every document emits (md5(window), position) postings — one
       linear pass, built-in expressions only;
    2. repeated window hashes are a hash aggregation with an early
       count cutoff;
    3. marked positions come back via an equi-join on the hash;
    4. maximal runs are gaps-and-islands per document (the window
       function partitions by document — bounded, never global).

    Returns (id_col, run_start, run_end, n_windows) with token
    positions 0-based and ``run_end`` exclusive: the span covers
    ``run_end - run_start`` tokens.  md5 (32 hex chars) keys the
    postings join for engine portability; at 100 TB swap in a 128-bit
    xxhash pair to halve the shuffle payload — the plan is unchanged.
    """
    from pyspark.sql import Window as W

    L = window
    toks = docs.select(
        F.col(id_col), tokens(normalize_text(F.col(text_col))).alias("w")
    )
    wins = F.transform(
        F.sequence(F.lit(0), F.size("w") - L),
        lambda i: F.struct(
            i.alias("pos"),
            F.md5(F.concat_ws(" ", F.slice(F.col("w"), i + 1, L))).alias("h"),
        ),
    )
    ex = (
        toks.where(F.size("w") >= L)
        .select(id_col, F.explode(wins).alias("s"))
        .select(id_col, F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
    )
    dup_h = (
        ex.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("h")
    )
    dup_pos = ex.join(dup_h, "h").select(id_col, "pos")
    w_doc = W.partitionBy(id_col).orderBy("pos")
    # A new run starts when the gap to the previous marked position
    # exceeds the window length: positions p_prev and p with
    # p - p_prev <= L have touching/overlapping covered spans
    # [p, p+L), so they belong to ONE maximal span.  (Consecutive-only
    # grouping — pos minus row_number — double-counted tokens when two
    # non-adjacent marked positions overlapped.)
    new_run = F.when(F.col("pos") - F.lag("pos").over(w_doc) > L, 1).otherwise(0)
    w_run = w_doc.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        dup_pos.withColumn("_grp", F.sum(new_run).over(w_run))
        .groupBy(id_col, "_grp")
        .agg(
            F.min("pos").alias("run_start"),
            (F.max("pos") + L).alias("run_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("_grp")
    )


def edit_distance_pairs(
    df: DataFrame, col: str, max_d: int = 2, q: int = 2
) -> DataFrame:
    """Edit-distance self-join over the DISTINCT values of ``col`` —
    the q-gram-filter + verify scheme (the PassJoin/Gravano-et-al.
    family), never the all-pairs cross product.

    Candidate generation: two strings within edit distance d and
    length ≥ q·(d+1) must share at least one q-gram (each edit destroys
    at most q grams, and a string of that length has ≥ q·d + 1 grams),
    so an equi-join on exploded distinct q-grams plus the
    ``|len(a) − len(b)| ≤ d`` length filter yields a candidate
    SUPERSET.  Strings shorter than q·(d+1) fall back to a
    length-bucketed join among themselves and against everything
    within the length filter (a bounded set by construction: there are
    at most |Σ|^(q·(d+1)) such strings).  Exact ``levenshtein``
    verification restores precision, so the result equals the brute-
    force join.  Returns (a, b, dist) with a < b and 1 ≤ dist ≤ max_d.
    """
    s = (
        df.select(F.col(col).cast("string").alias("s"))
        .where(F.col("s").isNotNull())
        .distinct()
    )
    # s is consumed FOUR times (both sides of the gram join, the short
    # side, and the short branch's probe side) and each consumer plans
    # its own scan + distinct pipeline (the r15 before-plan shows four
    # full copies).  Materialize the distinct-name frame once — its
    # working set is O(distinct values), the algorithm's own size.
    s = s.localCheckpoint(eager=False)
    min_len = q * (max_d + 1)
    grams = s.where(F.length("s") >= min_len).select(
        "s",
        F.explode_outer(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, length(s) - {q} + 1),"
                    f" i -> substring(s, i, {q}))"
                )
            )
        ).alias("g"),
    )
    a = grams.select(F.col("s").alias("a"), "g")
    b = grams.select(F.col("s").alias("b"), "g")
    cands_long = (
        a.join(b, "g")
        .where(
            (F.col("a") < F.col("b"))
            & (
                F.abs(F.length("a") - F.length("b")) <= max_d
            )
        )
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    # short strings: the q-gram bound does not apply below q*(d+1)
    # chars, so pair them against every string within the length
    # filter (short side is alphabet-bounded; broadcast it)
    short = s.where(F.length("s") < min_len)
    cands_short = (
        F.broadcast(short.select(F.col("s").alias("a")))
        .crossJoin(s.select(F.col("s").alias("b")))
        .where(
            (F.col("a") != F.col("b"))
            & (F.abs(F.length("a") - F.length("b")) <= max_d)
        )
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    cands = cands_long.unionByName(cands_short)
    dist = F.levenshtein(F.col("a"), F.col("b"))
    return cands.select("a", "b", dist.alias("dist")).where(
        F.col("dist") <= max_d
    )
