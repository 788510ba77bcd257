"""Deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes per operator:

- exact_duplicates: hash-groupBy — one shuffle on a 32-char key, not
  the full text. Map-side partial agg handles skew.
- n-gram Jaccard: inverted-index self-join on shingles (explode →
  join on shingle → pair-count), NOT an O(n²) cross join; union sizes
  come from per-doc shingle counts.
- MinHash: signatures built from md5(shingle # i) so the math is
  replicable in ANSI SQL; band keys bucket the signature (b bands of
  r), candidates = same-band pairs, verified by exact Jaccard. The
  banding join is the scale path: pair candidates only within a
  band bucket.
- SimHash: 60-bit signature from md5 of each word, majority vote per
  bit — pure Column algebra (explode + conv + bit ops), near-dup =
  Hamming distance ≤ d via bit_count(xor).
- Embedding cosine: exact pairs via blocked self-join; the LSH-bucketed
  variant lives in similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalize_text


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("fp", F.md5(normalize_text(F.col(text_col))))


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (post-normalization) documents.

    Returns (fp, dup_count, keep_id) for groups with >1 member;
    keep_id = min id (the canonical survivor).
    """
    return (
        with_fingerprint(df, text_col)
        .groupBy("fp")
        .agg(F.count("*").alias("dup_count"), F.min(id_col).alias("keep_id"))
        .filter(F.col("dup_count") > 1)
    )


def shingles(text: Column, n: int = 5) -> Column:
    """Distinct word n-gram shingles of the normalized text; texts with
    fewer than n words contribute their whole text as one shingle."""
    words = F.split(normalize_text(text), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return F.array_distinct(grams)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    Default semantics are EXACT over all shingles — consistent with the
    LSH verify path (minhash_lsh_pairs), which scores candidates over
    full shingle sets; the hot-shingle cap below is opt-in.

    .. versionchanged:: round 3
       ``max_shingle_df`` default changed from 1000 to None (exact by
       default). Callers relying on the old implicit cap must now pass
       ``max_shingle_df=1000`` explicitly to keep the bounded-blowup
       approximate semantics at corpus scale.

    Inverted-index join: |A∩B| = number of co-occurring distinct
    shingles; |A∪B| = |A| + |B| − |A∩B|. Returns
    (id_a, id_b, inter_size, union_size, jaccard_pct) with id_a < id_b.

    ``max_shingle_df`` (opt-in) drops shingles whose document frequency
    exceeds the cap BEFORE the self-join (sizes are computed over the
    same reduced shingle universe, so Jaccard stays internally
    consistent — but values can differ from the exact default, so the
    cap is never silently applied). Without it, one corpus-wide
    stop-phrase shingle shared by k docs emits k²/2 join rows into a
    single bucket — the classic inverted-index blowup; high-DF shingles
    carry almost no signal for Jaccard ≥ 0.5 decisions, so AT SCALE
    callers should pass a cap explicitly (the driver query uses 1000).
    """
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), n)).alias("shingle")
    )
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("sdf"))
            .filter(F.col("sdf") > max_shingle_df)
            .select("shingle")
        )
        # heavy hitters are few under any realistic (zipfian) corpus;
        # AQE turns this into a broadcast anti-join at runtime
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter_size"))
    )
    out = (
        pairs.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn("union_size", F.col("sz_a") + F.col("sz_b") - F.col("inter_size"))
        .withColumn(
            "jaccard_pct",
            F.round(F.lit(100.0) * F.col("inter_size") / F.col("union_size")).cast("int"),
        )
    )
    return out.filter(F.col("inter_size") / F.col("union_size") >= threshold).select(
        "id_a", "id_b", "inter_size", "union_size", "jaccard_pct"
    )


def minhash_signature(text: Column, k: int = 16, n: int = 5) -> Column:
    """k-element MinHash signature: element i = min over shingles of
    md5(shingle || '#' || i). md5-based so an ANSI-SQL oracle can
    reproduce it bit-for-bit (lexicographic min over hex strings)."""
    sh = shingles(text, n)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(s, F.lit("#"), i.cast("string"))))
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    n: int = 5,
    verify_threshold: float | None = 0.5,
) -> DataFrame:
    """MinHash + LSH banding: shingle → signature → band buckets →
    same-bucket candidate pairs (→ optional exact-Jaccard verify).

    rows-per-band r = k/bands; two docs collide in a band iff the r
    signature slots agree exactly, so the candidate join touches only
    bucket-mates — never the full pair space.
    """
    r = k // bands
    sig = df.select(
        F.col(id_col).alias("id"), minhash_signature(F.col(text_col), k, n).alias("sig")
    )
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(F.concat_ws(",", F.slice(F.col("sig"), b * r + 1, r))).alias("bkey"),
                ),
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bkey")
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bkey"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    if verify_threshold is None:
        return cand
    # Verify CANDIDATES ONLY — the whole point of banding is that exact
    # Jaccard runs per bucket-mate pair, never over the full corpus pair
    # space. Join the (id_a, id_b) candidates to each side's shingle
    # array and score with array_intersect; cost is O(candidates), and
    # the plan contains no full-table pair enumeration.
    sh_arr = df.select(F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("sh"))
    return (
        cand.join(sh_arr.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh_arr.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn("inter_size", F.size(F.array_intersect("sh_a", "sh_b")).cast("long"))
        .withColumn(
            "union_size",
            (F.size("sh_a") + F.size("sh_b")).cast("long") - F.col("inter_size"),
        )
        .withColumn(
            "jaccard_pct",
            F.round(F.lit(100.0) * F.col("inter_size") / F.col("union_size")).cast("int"),
        )
        .filter(F.col("inter_size") / F.col("union_size") >= verify_threshold)
        .select("id_a", "id_b", "inter_size", "union_size", "jaccard_pct")
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """60-bit SimHash per document, pure Column algebra.

    Each word hashes to 60 bits (15 hex chars of md5 → conv to long);
    bit j of the signature is the majority vote of all words' bit j.
    """
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w"),
    ).withColumn("h", F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long"))
    votes = words.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(60)
        ]
    )
    sig = votes.select(
        "id",
        sum(
            [F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
             for b in range(60)],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return sig


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    band_bits: int = 15,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded for scale:
    a pair within Hamming d of each other on 60 bits must agree exactly
    on at least one of 4 15-bit bands when d ≤ 3 (pigeonhole); larger d
    trades recall. Join on band value, verify with bit_count(xor)."""
    sig = simhash(df, id_col, text_col)
    nb = 60 // band_bits
    banded = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("bval"),
                    )
                    for b in range(nb)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", "bk.band", "bk.bval")
    pairs = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bval"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_col: str | None = None,
) -> DataFrame:
    """Exact cosine near-dup pairs via self-join.

    ``block_col`` restricts pairing to same-block rows (e.g. an LSH
    bucket or label) — the scale path; None compares all pairs (only
    sane for modest n or as ground truth). Dot products run JVM-side
    via zip_with + aggregate.
    """
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x))
    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), norm.alias("nrm"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    cond = [F.col("a.blk") == F.col("b.blk")] if block_col else []
    joined = (
        base.alias("a")
        .join(base.alias("b"), cond if cond else F.lit(True))
        .filter(F.col("a.id") < F.col("b.id"))
    )
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        joined.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (dot / (F.col("a.nrm") * F.col("b.nrm"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a near-duplicate PAIR list — the step
    that turns pairwise similarity output (minhash_lsh_pairs,
    simhash_near_dup_pairs, embedding_cosine_pairs, ...) into dedup
    DECISIONS: every document in a component gets the component's
    minimum id as ``cluster_id`` (the canonical survivor), so
    "keep one per cluster" is a filter on ``id == cluster_id``.

    Algorithm: min-label propagation — each round every node takes the
    min of its own label and its neighbors' labels; converges in
    O(diameter) rounds. Near-dup components are tiny (chains of a few
    documents), so 2-4 rounds is typical; the loop runs over ROUNDS,
    not rows (everything inside is DataFrame algebra — one shuffle per
    round on the edge key), and stops as soon as a round changes no
    label. At web scale this is the standard iterative-CC shape
    (label propagation / large-star small-star families); lineage is
    truncated every round via localCheckpoint so plans stay flat.

    Returns (id, cluster_id).
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    labels = (
        und.select(F.col("src").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            und.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("src", "id")
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=True)  # flat plan per round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # exhausting max_iter with labels still moving means some
        # component's diameter exceeds the round budget — returning
        # silently would hand back WRONG cluster_ids (transitive chains
        # are exactly the adversarial near-dup case)
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iter} rounds "
            "(a component's diameter exceeds max_iter); raise max_iter"
        )
    return labels.select("id", F.col("label").alias("cluster_id"))
