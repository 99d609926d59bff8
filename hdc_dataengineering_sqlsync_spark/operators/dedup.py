"""Deduplication operators for training-data pipelines (SURVEY.md §2.9).

Three tiers, in order of scale-readiness:
  exact         hash group-by on the text — one shuffle, always correct
  blocked-jaccard  exact pairwise Jaccard inside blocks — quadratic within a
                block, so the block key must stay selective; correct baseline
                for evaluating the approximate tiers
  MinHash-LSH   the 100 TB path: per-doc signature (map-side), band-bucket
                join, candidate verify — pair count scales with true-dup
                density, not corpus size²
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_tokens(text: Column | str, sep: str = " ") -> Column:
    """Order-preserving distinct token array — computed map-side (no
    explode/distinct shuffle)."""
    return F.array_distinct(F.split(text, sep))


def exact_dedup(df: DataFrame, on: list[str]) -> DataFrame:
    return df.dropDuplicates(on)


def _capped_tokens(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    blocks: list[str],
    max_df: int | None,
) -> DataFrame:
    """(id, *blocks, token) exploded distinct-token table, with tokens whose
    per-(block, token) document frequency exceeds ``max_df`` removed via a
    BROADCAST anti-join on the Zipf-small hot list (the big exploded side
    must not shuffle just to drop stopwords)."""
    tok = _spread(docs).select(
        F.col(id_col), *blocks, F.explode(distinct_tokens(F.col(text_col))).alias("token")
    )
    if max_df is not None:
        hot = (
            tok.groupBy(*blocks, "token")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_df)
            .drop("df")
        )
        tok = tok.join(F.broadcast(hot), [*blocks, "token"], "left_anti")
    return tok


def jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: list[str] | None = None,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Blocked pairwise token-set Jaccard, fully relational (SURVEY §2.9):
    explode distinct tokens -> self-join on (block, token) -> |A∩B| counts ->
    jaccard = i / (|A| + |B| - i). Returns (id, id2, jaccard) with id < id2.

    ``max_df``: drop tokens whose per-(block, token) document frequency
    exceeds it — from BOTH the join key and the set sizes, so the metric is
    Jaccard over the df-capped token universe. Without the cap, one token in
    g docs of a block contributes ~g^2/2 candidate pairs, which goes
    near-quadratic on hot (stopword/template) tokens at corpus scale; with
    it, per-token join fan-out is bounded by max_df^2 by construction. The
    surviving hot-token list is Zipf-small, so excluding it is a broadcast
    anti-join (map-side, no extra shuffle on the big side).
    """
    blocks = block_cols or []
    # tok feeds BOTH sides of the pair self-join (and, with a cap, the size
    # census); materialize the token table once so the explode(+df anti-join)
    # subtree doesn't recompute per consumer — the r10 plan audit caught it
    # running up to 4x in one plan. Checkpoint ONLY the df-capped form: with
    # a cap the table is the operator's bounded working set and its subtree
    # carries a census+anti-join worth saving; without one (max_df=None) the
    # table is an UNCAPPED exploded frame — bigger than the fact table, the
    # exact class the r10 rule ("checkpoint reductions, never fact-sized
    # frames") forbids — and its subtree is a cheap map-side explode, so
    # re-deriving per consumer is the right 100 TB trade. (_capped_tokens
    # stays separately callable so plan tests can assert the broadcast
    # anti-join shape pre-checkpoint.)
    tok = _capped_tokens(docs, id_col, text_col, blocks, max_df)
    if max_df is not None:
        tok = tok.localCheckpoint(eager=True)
        sizes = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    else:
        sizes = docs.select(F.col(id_col), F.size(distinct_tokens(F.col(text_col))).alias("sz"))

    a = tok.select(
        F.col(id_col).alias("id_a"), *[F.col(b).alias(f"ba_{b}") for b in blocks], "token"
    )
    b = tok.select(
        F.col(id_col).alias("id_b"), *[F.col(b_).alias(f"bb_{b_}") for b_ in blocks], "token"
    )
    cond = (a.id_a < b.id_b) & (a.token == b.token)
    for blk in blocks:
        cond = cond & (F.col(f"ba_{blk}") == F.col(f"bb_{blk}"))
    inter = a.join(b, cond).groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("i"))

    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("i").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("i"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.col("id_a").alias(id_col),
            F.col("id_b").alias(f"{id_col}2"),
            F.round(jac, 4).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def word_shingles(text: Column | str, k: int = 3, sep: str = " ") -> Column:
    """k-word shingles as strings; empty array when the doc has < k tokens."""
    tok = F.split(text, sep)
    n = F.size(tok)
    idx = F.sequence(F.lit(0), n - k)  # 0-based start positions
    mk = lambda i: F.concat_ws(  # noqa: E731
        sep, *[F.element_at(tok, i + F.lit(j + 1)) for j in range(k)]
    )
    return F.when(n >= k, F.transform(idx, mk)).otherwise(F.array().cast("array<string>"))


def simhash16(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: list[str] | None = None,
) -> DataFrame:
    """16-bit SimHash per document, cross-engine reproducible.

    Token hash = first 4 hex nibbles of ``md5(token)`` (md5 probed
    byte-identical across engines); per bit position, sum +-1 votes over the
    doc's distinct tokens; sign of the sum is the bit. Expressed relationally
    (explode tokens x 16 bit positions -> one keyed shuffle) so a DuckDB
    oracle can replay the identical algebra. At 100 TB the same signature is
    computed map-side in one pass (pandas_udf packing all 16 counters);
    the relational form here is the correctness baseline.
    """
    blocks = block_cols or []
    tok = _spread(docs).select(
        F.col(id_col), *blocks, F.explode(distinct_tokens(F.col(text_col))).alias("token")
    ).withColumn("_h", F.md5(F.col("token")))  # hash ONCE per token, before the x16 explode
    bits = tok.select(
        F.col(id_col),
        *blocks,
        F.col("_h"),
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("bitpos"),
    )
    # nibble index 1..4 from bitpos, bit-within-nibble 0..3
    nib_char = F.substring(F.col("_h"), (F.col("bitpos") / 4 + 1).cast("int"), 1)
    nib_val = F.conv(nib_char, 16, 10).cast("int")
    bit = (F.floor(nib_val / F.pow(F.lit(2.0), (F.col("bitpos") % 4).cast("double"))).cast("int") % 2)
    vote = (bit * 2 - 1).alias("vote")
    per_bit = (
        bits.select(F.col(id_col), *blocks, F.col("bitpos"), vote)
        .groupBy(id_col, *blocks, "bitpos")
        .agg(F.sum("vote").alias("v"))
    )
    sh = F.sum(
        F.when(F.col("v") >= 0, F.pow(F.lit(2.0), F.col("bitpos").cast("double")).cast("long")).otherwise(F.lit(0))
    ).alias("simhash")
    return per_bit.groupBy(id_col, *blocks).agg(sh)


def simhash_topk_pairs(
    docs: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "lang",
) -> DataFrame:
    """Top-k most-similar doc pairs by SimHash Hamming distance, blocked by
    ``block_col`` (pairwise only inside a block). Deterministic total order
    (hamming ASC, id, id2). The 100 TB path blocks further by signature bands
    so the pair count tracks true-dup density, not corpus size^2."""
    sh = simhash16(docs, id_col=id_col, text_col=text_col, block_cols=[block_col])
    a = sh.select(
        F.col(block_col), F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a")
    )
    b = sh.select(
        F.col(block_col).alias("_blk"), F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b")
    )
    pairs = a.join(b, (a[block_col] == b["_blk"]) & (F.col("id_a") < F.col("id_b")))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming")
    return (
        pairs.select(F.col("id_a").alias(id_col), F.col("id_b").alias(f"{id_col}2"), ham)
        .orderBy("hamming", id_col, f"{id_col}2")
        .limit(k)
    )


def shingle_jaccard_pairs(
    docs: DataFrame,
    k_shingle: int = 3,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "lang",
    left_ids: DataFrame | None = None,
) -> DataFrame:
    """n-gram (k-word-shingle) Jaccard near-dup pairs, blocked by
    ``block_col``. Same relational plan as ``jaccard_pairs`` but over
    k-shingles instead of unigrams — shingles catch local word order, the
    standard near-dup signal (and the exact-verify stage behind MinHash-LSH).

    ``left_ids`` (optional, single ``id_col`` column) restricts the LEFT
    (lower-id) side of the pair join to a document sample BEFORE the
    shingle self-join — the scale path for exact-truth evaluation legs:
    the quadratic all-pairs scan becomes |sample|·n, linear in the corpus
    for a fixed sample. The filter is a broadcast semi-join (the sample is
    small by construction), so only sampled docs' shingles enter the join
    build side; pairs keep the ``id_a < id_b`` convention, i.e. a pair
    survives iff its LOWER id is sampled.
    """
    # sh feeds both join sides and the size census — materialize the shingle
    # table once (same recompute fix as jaccard_pairs above, r10 plan audit).
    # r12: persist(MEMORY_AND_DISK)+count, NOT localCheckpoint — the shingle
    # table is larger than the fact table (k words per token position), and
    # a checkpoint of it would truncate lineage: on a real cluster an
    # executor loss after the checkpoint kills the query, while a persisted
    # frame just recomputes the lost partitions from the parquet scan. The
    # count() materializes the cache up front so all three consumers
    # (size census + both join sides) share one pass over the explode.
    from pyspark.storagelevel import StorageLevel

    sh = _spread(docs).select(
        F.col(id_col),
        F.col(block_col),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), k=k_shingle))).alias("shingle"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sh.count()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sh_left = sh if left_ids is None else sh.join(F.broadcast(left_ids), id_col, "left_semi")
    a = sh_left.select(F.col(id_col).alias("id_a"), F.col(block_col).alias("blk_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), F.col(block_col).alias("blk_b"), "shingle")
    inter = (
        a.join(b, (F.col("blk_a") == F.col("blk_b")) & (F.col("id_a") < F.col("id_b")) & (a.shingle == b.shingle))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.round(F.col("i").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("i")), 4)
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(F.col("id_a").alias(id_col), F.col("id_b").alias(f"{id_col}2"), jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def connected_components(
    edges: DataFrame,
    src: str = "doc_id",
    dst: str = "doc_id2",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over an undirected edge list by iterative
    min-label propagation: every node starts labeled with its own id; each
    round replaces the label with the minimum over itself and its neighbors'
    labels, until a fixpoint. Returns ``(node, comp)`` where ``comp`` is the
    smallest node id in the component — the canonical cluster representative
    a dedup pipeline keeps.

    Scale notes: labels only ever decrease, so the loop converges in at most
    ``diameter(G)`` rounds; near-dup graphs are dense little cliques, so 2-3
    rounds in practice. Each round is ONE shuffle (join on nbr + groupBy
    node); ``localCheckpoint`` truncates lineage so the plan stays flat
    across rounds. The convergence probe carries each node's PREVIOUS label
    through the checkpointed frame and runs ``filter != + limit(1).count()``
    over it — a map-side scan of already-materialized partitions. (The pre-
    r12 probe re-joined the new labels against the old label table, one
    extra keyed shuffle per round for information the round already had in
    hand.) For adversarial long-chain graphs at 100 TB, swap the body for
    alternating large-star/small-star rounds (Kiveris et al., "Connected
    Components in MapReduce and Beyond") which converge in O(log n) rounds;
    the interface stays the same.
    """
    fwd = edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
    und = fwd.unionByName(
        edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr"))
    ).localCheckpoint(eager=True)  # materialize ONCE — every round re-reads it
    labels = und.select("node").distinct().withColumn("comp", F.col("node"))
    for _ in range(max_iter):
        nbr_min = (
            und.join(labels.select(F.col("node").alias("nbr"), F.col("comp").alias("nc")), "nbr")
            .groupBy("node")
            .agg(F.min("nc").alias("nbr_min"))
        )
        stepped = labels.join(nbr_min, "node", "left").select(
            "node",
            F.col("comp").alias("prev"),
            F.least("comp", F.coalesce("nbr_min", "comp")).alias("comp"),
        )
        # pointer jumping: comp := min(comp, label(comp)). Every comp value is
        # itself a node id, so this hop doubles the propagation distance per
        # round — O(log diameter) rounds instead of O(diameter).
        jump = stepped.select(F.col("node").alias("comp"), F.col("comp").alias("jc"))
        new = (
            stepped.join(jump, "comp", "left")
            .select(
                "node", "prev", F.least("comp", F.coalesce("jc", "comp")).alias("comp")
            )
            .localCheckpoint(eager=True)
        )
        changed = new.where(F.col("comp") != F.col("prev")).limit(1).count()
        labels = new.select("node", "comp")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "returning partial labels would split components silently; raise "
        "max_iter (rounds needed ~ log2(graph diameter) with pointer jumping)"
    )


def cluster_summary(labels: DataFrame, node_col: str = "node", comp_col: str = "comp") -> DataFrame:
    """Per-component rollup of a components labeling: ``(cluster_id, n_docs,
    members)`` with members as the comma-joined sorted id list (SURVEY §2
    convention 3: no raw arrays in t2 output)."""
    return (
        labels.groupBy(F.col(comp_col).alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(node_col)), lambda x: x.cast("string")
                ),
                ",",
            ).alias("members"),
        )
        .orderBy("cluster_id")
    )


# Universal-hash family for the cross-engine MinHash: h_i(x) = (a_i*H(x) +
# b_i) mod P with H = first 7 hex nibbles of md5 (28 bits, < P). P is the
# Mersenne prime 2^31-1; a_i < 1e9 keeps a*H < 2.7e17, far inside int64.
# The SAME literals feed the Spark plan and the DuckDB oracle — one family,
# two renderings, so t2 can hash-match the signatures exactly.
MINHASH_P = 2147483647
MINHASH_AB: list[tuple[int, int]] = [
    (370248451, 95089), (204506323, 1299721), (522289757, 433024223),
    (650000117, 87178291), (131542391, 15485863), (96002369, 49979687),
    (812376289, 67867967), (431100041, 23456789), (277000213, 122949829),
    (157858213, 86028157), (908060467, 32452843), (555555559, 179424673),
]


def minhash_signature(shingle_hashes: Column, n_hashes: int = 12) -> Column:
    """MinHash signature (array of ``n_hashes`` minima) from an array of
    pre-computed 28-bit shingle hashes — pure map-side higher-order
    functions, zero shuffle.

    ONE ``aggregate`` pass with an n-way minimum accumulator, not n
    ``array_min(transform(...))`` expressions: projection collapse inlines
    the shingle-hash expression into every usage, so the n-expression form
    recomputes the md5 base hashes n times (higher-order functions run
    interpreted — no codegen, no CSE). Same hash family, bit-identical
    signatures. Measured effect at sf0.1 local: modest (12.7s -> 11.8s warm
    for the LSH-components pipeline — single-partition shingle construction
    dominates there, a local-fixture artifact); the md5 dedup matters
    proportionally as n_hashes grows past the default 12.

    An EMPTY ``shingle_hashes`` array yields ``[MINHASH_P] * n_hashes``
    (the fold's identity element), not NULLs — every internal caller
    filters ``size > 0`` first (empty docs have no signature), so direct
    callers must do the same or treat the identity vector as "no shingles".
    """
    a_consts = F.array(*[F.lit(a) for a, _ in MINHASH_AB[:n_hashes]])
    b_consts = F.array(*[F.lit(b) for _, b in MINHASH_AB[:n_hashes]])
    init = F.array(*[F.lit(MINHASH_P).cast("long") for _ in range(n_hashes)])
    return F.aggregate(
        shingle_hashes,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.zip_with(a_consts, b_consts, lambda a, b: (a * h + b) % F.lit(MINHASH_P)),
            lambda x, y: F.least(x, y),
        ),
    )


def _spread(df: DataFrame) -> DataFrame:
    """Scale map parallelism up to the session default when the input
    arrives in fewer partitions than cores.

    A small landing file (or a coalesced upstream) otherwise pins the
    expensive per-shingle hashing onto one task — measured 9.3s -> sub-
    second for the sf0.1 signature pass on local[32]. The round-robin
    shuffle moves only the raw docs once, trivially cheaper than the
    hashing it parallelizes; when the input already has >= cores
    partitions (any real 100 TB scan), this is a no-op and no shuffle is
    added.

    Under-parallelism is detected from ``inputFiles()`` — a pure
    driver-side file listing. Probing ``df.rdd.getNumPartitions()``
    instead would MATERIALIZE upstream AQE query stages for any input
    whose plan contains an exchange (a caller-supplied join/groupBy
    result), silently executing the expensive upstream twice. Inputs with
    an EMPTY listing (pure exchange output, in-memory relations) are left
    alone: they have already been shuffled, so their parallelism is the
    session's shuffle setting. Two accepted imprecisions, both one
    harmless extra round-robin pass of data the hash stage dwarfs:
    (1) a single LARGE splittable file that Spark would split into many
    tasks anyway, and (2) a join/union OF file scans — ``inputFiles()``
    reports the union of LEAF files even when the plan already contains
    an exchange, so an already-shuffled wide input whose leaf-file count
    is below the core count gets repartitioned once more."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df
    if 0 < n_files < target:
        return df.repartition(target)
    return df


def _minhash_sigs(docs: DataFrame, id_col: str, text_col: str, n_hashes: int) -> DataFrame:
    """(id, _sig) cross-engine MinHash signatures — entirely map-side.

    r7: Arrow-batched numpy path. The r5 single-projection HOF form was
    already CSE-safe, but higher-order functions run interpreted (no
    codegen), so the per-shingle md5 + 12 universal-hash minima dominated
    the whole minhash family — STRESS factor-10 measured it as the worst
    probe (5.2× wall on 10× docs, a pure linear-hashing floor). The same
    EXACT semantics run here through one mapInPandas: Python's split(' ')
    keeps trailing empties like Java's limit=-1 regex split, the shingle
    string and its md5 first-7-nibble integer are byte-identical to
    `conv(substring(md5(s),1,7),16,10)`, and the (a·h+b) mod P minima are
    one numpy broadcast — minima are order-free, so the Python set's
    iteration order is irrelevant. Bit-identical signatures, ~5× less
    wall; the DuckDB oracle is untouched.

    Docs with < 3 tokens shingle to nothing and emit no row (the previous
    form's filter semantics)."""
    assert n_hashes <= len(MINHASH_AB)
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    a_np = np.array([a for a, _ in MINHASH_AB[:n_hashes]], dtype=np.int64)
    b_np = np.array([b for _, b in MINHASH_AB[:n_hashes]], dtype=np.int64)
    id_field = docs.schema[id_col]
    schema = T.StructType(
        [id_field, T.StructField("_sig", T.ArrayType(T.LongType()), False)]
    )

    def gen(batches):
        for pdf in batches:
            ids, sigs = [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                if txt is None:
                    continue
                tok = txt.split(" ")
                if len(tok) < 3:
                    continue
                sh = {" ".join(tok[k : k + 3]) for k in range(len(tok) - 2)}
                hs = np.fromiter(
                    (
                        int(hashlib.md5(s.encode("utf-8")).hexdigest()[:7], 16)
                        for s in sh
                    ),
                    dtype=np.int64,
                    count=len(sh),
                )
                sigs.append(
                    ((hs[:, None] * a_np[None, :] + b_np[None, :]) % MINHASH_P)
                    .min(axis=0)
                    .tolist()
                )
                ids.append(i)
            yield pd.DataFrame({id_col: ids, "_sig": sigs})

    return _spread(docs.select(id_col, text_col)).mapInPandas(gen, schema=schema)


def _band_buckets(sigs: DataFrame, id_col: str, bands: int, rows_per_band: int) -> DataFrame:
    """(id, band, bkey) bucket assignments from signatures: one md5 per
    ``rows_per_band``-slice of the signature."""
    band_structs = F.array(*[
        F.struct(
            F.lit(j).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at("_sig", j * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            ).alias("bkey"),
        )
        for j in range(bands)
    ])
    return sigs.select(F.col(id_col), F.explode(band_structs).alias("b")).select(
        id_col, "b.band", "b.bkey"
    )


def minhash_banded_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 4,
    rows_per_band: int = 3,
) -> DataFrame:
    """Cross-engine MinHash + banded LSH near-dup candidates.

    The from-scratch counterpart of ``minhash_lsh_pairs`` (spark.ml): per-doc
    signatures are computed entirely map-side (md5 base hash + universal-hash
    minima over distinct 3-word shingles); banding (md5 of each
    ``rows_per_band``-slice) buckets docs so candidate generation is a
    self-equi-join on (band, bucket) — pair count tracks true-dup density,
    not corpus size². With b=4, r=3 the S-curve catch threshold is
    (1/b)^(1/r) ≈ 0.63 Jaccard. Output: (id, id2, est_jaccard = matching
    signature fraction), ordered est DESC then ids.

    Unlike the spark.ml hash family, this one reproduces in ANSI SQL, so the
    t2 oracle hash-matches it exactly (SURVEY.md §2.9).
    """
    n_hashes = bands * rows_per_band
    # signatures are the expensive part (one md5 per shingle); materialize
    # once — they feed the bucket join twice and the estimate join twice
    sigs = _minhash_sigs(docs, id_col, text_col, n_hashes).localCheckpoint(eager=True)
    buckets = _band_buckets(sigs, id_col, bands, rows_per_band)
    a = buckets.select(F.col(id_col).alias("id_a"), "band", "bkey")
    b = buckets.select(F.col(id_col).alias("id_b"), "band", "bkey")
    cand = (
        a.join(b, ["band", "bkey"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("_sig").alias("_sa"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("_sig").alias("_sb"))
    est = F.size(F.filter(F.zip_with("_sa", "_sb", lambda x, y: x == y), lambda v: v)) / F.lit(
        float(n_hashes)
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.col("id_a").alias(id_col),
            F.col("id_b").alias(f"{id_col}2"),
            F.round(est, 4).alias("est_jaccard"),
        )
        .orderBy(F.col("est_jaccard").desc(), id_col, f"{id_col}2")
    )


def lsh_star_edges(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 4,
    rows_per_band: int = 3,
) -> DataFrame:
    """O(n·bands) clustering edges from LSH buckets: within each (band,
    bucket), connect every doc to the bucket's MINIMUM doc id (a star).

    A bucket with m docs contributes m-1 star edges instead of the clique's
    m(m-1)/2 — same connectivity (any two docs sharing a bucket reach each
    other through the bucket root), so connected components over star edges
    equal components over the full candidate-pair graph. This is what makes
    LSH dedup clustering linear in corpus size even when the corpus is
    pathologically dense (every doc a near-dup of every other): the
    quadratic explosion of pair enumeration never happens.
    """
    # materialize SIGNATURES before banding: _band_buckets references _sig
    # once per signature slot (element_at x bands*rows_per_band), and
    # projection collapse would re-run the whole per-shingle hash pipeline
    # for each reference on an unmaterialized input. The bucket table also
    # feeds two consumers (root agg + star join), but from a checkpointed
    # signature table the band explode is a cheap map-side projection —
    # re-deriving it per consumer beats a second blocking materialization
    # (r12: measured 1.49s -> 1.15s on the sf0.1 star-edge pass).
    sigs = _minhash_sigs(docs, id_col, text_col, bands * rows_per_band)
    buckets = _band_buckets(
        sigs.localCheckpoint(eager=True),
        id_col,
        bands,
        rows_per_band,
    )
    roots = buckets.groupBy("band", "bkey").agg(F.min(id_col).alias("_root"))
    return (
        buckets.join(roots, ["band", "bkey"])
        .where(F.col(id_col) != F.col("_root"))
        .select(F.col("_root").alias(id_col), F.col(id_col).alias(f"{id_col}2"))
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    distance_threshold: float = 0.3,
    num_hash_tables: int = 5,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH near-dup candidates at Jaccard distance < threshold.

    spark.ml MinHashLSH over hashed 3-word-shingle sets. This is the path
    that survives 100 TB: signatures are computed map-side, candidate pairs
    come from band-bucket joins, and the full pairwise verify only touches
    candidates. Hash family is engine-specific -> rows-only in t2.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    shingled = docs.select(
        F.col(id_col), word_shingles(F.col(text_col)).alias("shingles")
    ).where(F.size("shingles") > 0)
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=num_features, binary=True)
    feats = tf.transform(shingled)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, distance_threshold, distCol="jaccard_dist")
    return (
        pairs.where(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias(id_col),
            F.col(f"datasetB.{id_col}").alias(f"{id_col}2"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
        .orderBy(id_col, f"{id_col}2")
    )
