"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the 100 TB story):
- exact dedup is a hash-groupBy on a fingerprint — one shuffle, map-side
  combined;
- MinHash+LSH never materializes the O(n²) pair space: docs are expanded to
  (band, band-key) rows, grouped, and only same-bucket candidates are
  pair-joined. Bucket sizes are bounded by construction (signature collisions),
  so the join is skew-resistant; banding parameters trade recall vs cost;
- SimHash expands to (token, bit) rows — linear in corpus token count — and
  reduces with two groupBys;
- n-gram Jaccard verification runs only on candidate pairs (or within small
  blocks), never all-pairs.

Hash functions are md5-derived (seeded by prefix) specifically so a DuckDB
oracle can reproduce them bit-for-bit; swap `_MINHASH_HASH` for xxhash64 when
oracle parity is not needed (≈3× faster, same semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from multi_source_financial_data_pipeline_spark.operators.text import tokens


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams, built with 1-indexed element_at so the DuckDB
    oracle (`toks[i]`) mirrors it exactly. Docs with < n tokens get an empty
    array (DuckDB's generate_series(1, len-n+1) is empty there; Spark's
    sequence would count backwards, hence the guard)."""
    toks = tokens(text)
    gram = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(gram)).otherwise(
        F.array().cast("array<string>")
    )


def _minhash_one(shingle_col: Column, seed: int) -> Column:
    """One MinHash value as a 16-hex-char string: min over shingles of
    md5(seed || '|' || shingle). Lexicographic min on fixed-width lowercase
    hex == numeric min, identically in Spark and DuckDB."""
    return F.array_min(
        F.transform(
            shingle_col,
            lambda s: F.substring(F.md5(F.concat(F.lit(f"{seed}|"), s)), 1, 16),
        )
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", num_hashes: int = 8, shingle_n: int = 3
) -> DataFrame:
    """Per-doc MinHash signature columns mh0..mh{k-1}."""
    sh = shingles(F.col(text_col), shingle_n)
    out = df.withColumn("__sh", sh)
    for j in range(num_hashes):
        out = out.withColumn(f"mh{j}", _minhash_one(F.col("__sh"), j))
    return out.drop("__sh")


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """LSH banding: signature split into bands of `band_size` hashes; docs
    sharing any full band become a candidate pair. Returns distinct
    (id_a, id_b) with id_a < id_b. Null bands (empty shingle sets) never
    match — equi-join semantics drop them in both engines."""
    n_bands = num_hashes // band_size
    band_frames = []
    for b in range(n_bands):
        cols = [f"mh{j}" for j in range(b * band_size, (b + 1) * band_size)]
        band_frames.append(
            sig.select(
                F.col(id_col).alias("id"),
                F.lit(b).alias("band"),
                F.concat_ws("|", *cols).alias("band_key"),
            ).filter(F.col("band_key") != "")
        )
    bands = band_frames[0]
    for f in band_frames[1:]:
        bands = bands.unionByName(f)
    # the signature pipeline (shingling + k md5 min-hashes) is expensive;
    # without a persist the self-join × band-union recomputes it 2×bands times
    bands = bands.persist()
    a = bands.alias("a")
    b_ = bands.alias("b")
    pairs = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    block_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs inside a blocking key (language,
    source, LSH bucket, ...): |A∩B| / |A∪B| >= threshold. The block keeps the
    pair join bounded; never run this all-pairs at scale."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jacc = inter / F.nullif(union, F.lit(0))  # two empty shingle sets → null
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            jacc.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash32(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash over the token multiset: per token, hash to 32 bits
    (md5-hex → int for oracle parity); per bit, sum +1/-1 across tokens;
    positive sums set the bit. Linear explode (tokens × 32) + two groupBys —
    no pair joins, fully distributed."""
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("t")
    )
    h = tok.select(
        "id",
        F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long").alias("h"),
    )
    bits = h.select("id", "h", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"))
    contrib = F.when(F.expr("shiftright(h, b) & 1") == 1, F.lit(1)).otherwise(F.lit(-1))
    bit_sums = bits.groupBy("id", "b").agg(F.sum(contrib).alias("s"))
    return (
        bit_sums.groupBy("id")
        .agg(
            F.sum(
                F.when(
                    F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), b)")
                ).otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
        .withColumnRenamed("id", id_col)
    )


def exact_dedup_groups(
    df: DataFrame, key_col: str = "fingerprint", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup as hash-groupBy: per fingerprint, the surviving (min) id
    and the group size."""
    return df.groupBy(key_col).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
