"""Text-analysis operators for a training-data pipeline (north-star scope:
BASELINE.json — language ID, quality scoring, token counting, fingerprinting).

All JVM-side expressions (split/transform/filter/md5) — no Python UDFs — so
the hot path stays inside whole-stage codegen and scales linearly with the
document count. Token arrays use 1-indexed ``element_at`` so the DuckDB
oracles can mirror the expressions verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Tiny English stopword list for the n-gram/stopword language heuristic.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the BPE-ish regex path would swap the pattern
    here; whitespace matches the synthetic corpus)."""
    return F.split(text, r"\s+")


def word_ngrams(text: Column, n: int) -> Column:
    """Word n-grams as an array (duplicates KEPT — repetition analysis needs
    multiplicity; `dedup.shingles` wraps this with array_distinct). Built
    from zipped row-level array slices: the transform lambda touches only
    its own element, so nothing is re-evaluated per element (a lambda that
    indexes back into the token array re-tokenizes the document once per
    gram — O(doc²) per row). Docs with < n tokens get an empty array."""
    toks = tokens(text)
    width = F.size(toks) - (n - 1)
    z = F.arrays_zip(*[F.slice(toks, k + 1, width) for k in range(n)])
    gram = F.transform(z, lambda g: F.concat_ws(" ", *[g[str(k)] for k in range(n)]))
    return F.when(F.size(toks) >= n, gram).otherwise(
        F.array().cast("array<string>")
    )


#: Gopher-style repetition thresholds (Rae et al. 2021, table A1 flavor):
#: a doc is flagged when its most frequent bigram covers too much of the
#: text or too many of its trigrams are repeats.
REP_TOP_BIGRAM_MAX = 0.18
REP_DUP_TRIGRAM_MAX = 0.30


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc repetition metrics for training-data curation:

    - ``top_bigram_frac``: count of the single most frequent bigram over the
      total bigram count (boilerplate/chorus detector);
    - ``dup_trigram_frac``: 1 − distinct/total trigrams (local-loop detector);
    - ``is_repetitive``: either metric over its Gopher-style threshold.

    Shape: SHUFFLE-FREE — every metric is doc-local (a gram count never
    crosses documents), so the whole thing is one map-only projection
    over one scan of the text column. The trigram metric is
    ``array_distinct`` arithmetic; the bigram mode is a max-run-length
    fold over the doc's SORTED bigram array (``array_sort`` puts equal
    grams adjacent, so max multiplicity == max run) — O(g log g) CPU per
    doc, zero exchange, zero Python. The r11 rewrite retired the
    tagged-gram explode + two groupBys, which shuffled O(corpus grams)
    of string keys twice for per-doc answers (2.5× slower at sf0.1 —
    3.74 s vs 1.50 s — and at 100 TB that shuffle IS the corpus);
    per-doc array memory is unchanged — the explode formulation
    materialized the same combined gram array per row before exploding
    it.
    """
    # max multiplicity == max run length in the SORTED bigram array. Each
    # expensive intermediate (gram arrays, the sorted array) is ALIASED in
    # its own projection so it evaluates ONCE: projection expressions get
    # no common-subexpression elimination, and a single-select version
    # re-built the gram arrays per reference (measured 6.6 s vs 1.5 s at
    # sf0.1 — CollapseProject keeps multiply-referenced non-cheap aliases
    # in their own step, which is exactly what this chain relies on). The
    # run fold is int-only over one vectorized zip_with equality pass —
    # HOF lambdas are interpreted per element, so the fold must not carry
    # strings or wide structs.
    grams = df.select(
        id_col,
        word_ngrams(F.col(text_col), 2).alias("__bi"),
        word_ngrams(F.col(text_col), 3).alias("__tri"),
    )
    sized = grams.select(
        id_col,
        F.array_sort("__bi").alias("__s"),
        F.size("__bi").cast("long").alias("__nb"),
        F.size(F.array_distinct("__tri")).cast("long").alias("__dt"),
        F.size("__tri").cast("long").alias("__nt"),
    )
    # slice length must be >= 0: a doc with < 2 tokens has an EMPTY bigram
    # array (__nb == 0), where __nb - 1 would be -1 and slice() raises
    pairs = F.greatest(F.lit(0), (F.col("__nb") - 1).cast("int"))
    eq = F.zip_with(
        F.slice(F.col("__s"), 1, pairs),
        F.slice(F.col("__s"), 2, pairs),
        lambda a, b: (a == b).cast("int"),
    )
    folded = sized.select(
        id_col,
        "__nb",
        "__dt",
        "__nt",
        F.aggregate(
            eq,
            F.struct(
                F.lit(0).cast("long").alias("run"),
                F.lit(0).cast("long").alias("best"),
            ),
            lambda acc, x: F.struct(
                (
                    F.when(x == 1, acc["run"] + F.lit(1)).otherwise(
                        F.lit(0).cast("long")
                    )
                ).alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(x == 1, acc["run"] + F.lit(1)).otherwise(
                        F.lit(0).cast("long")
                    ),
                ).alias("best"),
            ),
            # k adjacent-equal pairs in the longest run = k+1 equal grams
            lambda acc: acc["best"] + F.lit(1),
        ).alias("__maxrun"),
    )
    top = F.when(
        F.col("__nb") > 0,
        F.col("__maxrun").cast("double") / F.col("__nb").cast("double"),
    ).otherwise(F.lit(0.0))
    dup = F.when(
        F.col("__nt") > 0,
        F.lit(1.0) - F.col("__dt").cast("double") / F.col("__nt").cast("double"),
    ).otherwise(F.lit(0.0))
    return folded.select(
        id_col,
        top.alias("top_bigram_frac"),
        dup.alias("dup_trigram_frac"),
        (
            (top > REP_TOP_BIGRAM_MAX) | (dup > REP_DUP_TRIGRAM_MAX)
        )
        .cast("int")
        .alias("is_repetitive"),
    )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc token counting + type-token ratio."""
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    return df.select(
        "doc_id",
        F.length(text_col).alias("n_chars_text"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        (n_distinct / n_tokens).alias("type_token_ratio"),
    )


#: GPT-2-style pretokenizer, restricted to constructs RE2 and Java regex
#: interpret identically (no lookahead — the original's `\s+(?!\S)` is
#: dropped; trailing whitespace runs fold into the final `\s+` branch).
#: Branch order matters and is part of the contract: contractions first,
#: then space-prefixed letter runs, digit runs, punctuation runs, whitespace.
SUBWORD_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def subwords(text: Column) -> Column:
    """BPE-ish pretokenization (the unit-count a byte-pair tokenizer would
    see before merges — the standard proxy for LLM token budgeting when the
    merge table isn't shipped with the engine). Pure JVM regex, no UDF."""
    return F.regexp_extract_all(text, F.lit(SUBWORD_PATTERN), 0)


def subword_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc subword counting next to whitespace counting: the ratio is
    the fertility estimate (subwords per word) used to budget token counts
    at corpus scale. One projection, linear, no shuffle."""
    sw = subwords(F.col(text_col))
    ws = tokens(F.col(text_col))
    n_sub = F.size(sw)
    return df.select(
        "doc_id",
        n_sub.alias("n_subwords"),
        F.size(F.array_distinct(sw)).alias("n_distinct_subwords"),
        (n_sub / F.size(ws)).alias("fertility"),
    )


def stopword_ratio(text: Column) -> Column:
    quoted = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    toks = tokens(text)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*EN_STOPWORDS)))
    _ = quoted  # mirror string kept for oracle builders
    return n_stop / F.size(toks)


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: stopword-hit ratio against a per-language
    function-word list (here only the English list — the synthetic corpus is
    English-ish regardless of its `lang` label)."""
    ratio = stopword_ratio(F.col(text_col))
    return df.select(
        "doc_id",
        ratio.alias("stopword_ratio"),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("unknown")).alias("lang_guess"),
    )


def quality_columns(text_col: str = "text") -> dict[str, Column]:
    """Column-level quality metrics, so callers can fuse them into a wider
    single-scan projection (the curation pipeline computes quality, lang-ID
    and token counts in ONE pass instead of joining three scans)."""
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n_tokens
    mean_tok_len = (F.length(text_col) - (n_tokens - 1)) / n_tokens
    length_score = F.when(n_tokens >= 50, F.lit(1.0)).otherwise(n_tokens / 50.0)
    quality = length_score * 0.5 + ttr * 0.3 + F.least(mean_tok_len / 10.0, F.lit(1.0)) * 0.2
    return {
        "n_tokens": n_tokens,
        "type_token_ratio": ttr,
        "mean_token_len": mean_tok_len,
        "quality_score": quality,
    }


def doc_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring from cheap structural signals: length band, lexical
    diversity, mean token length. Deterministic double arithmetic only."""
    cols = quality_columns(text_col)
    return df.select(
        "doc_id", *[expr.alias(name) for name, expr in cols.items()]
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over the whitespace-normalized, lowercased
    text — the exact-dedup key."""
    normalized = F.concat_ws(" ", tokens(F.lower(F.col(text_col))))
    return df.withColumn("fingerprint", F.md5(normalized))


def vocab_topk(
    df: DataFrame, k: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus vocabulary heavy hitters: token → total count + document
    frequency, deterministic top-k (count desc, token asc). Explode +
    map-side-combined groupBy + TakeOrderedAndProject — the vocabulary-stats
    pass every tokenizer-training pipeline runs over its corpus."""
    from pyspark.sql import Window

    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("t"))
    counts = tok.groupBy("t").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct(id_col).alias("n_docs"),
    )
    # distributed top-k first (TakeOrderedAndProject — no global sort, no
    # single-partition window over the full vocabulary), then rank the k
    # survivors with a window over just those rows
    topk = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("t").asc()
    ).limit(k)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("t").asc())
    return topk.withColumn("rank", F.row_number().over(w).cast("int")).select(
        F.col("t").alias("token"), "n_occurrences", "n_docs", "rank"
    )


def scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Text cleaning pass: lowercase, digit runs → '#', whitespace
    normalized — the canonicalization step before dedup/tokenization in a
    training-data pipeline. Patterns stay in the portable regex subset
    (character classes + quantifiers) so any engine applies them
    identically."""
    cleaned = F.concat_ws(
        " ",
        tokens(F.regexp_replace(F.lower(F.col(text_col)), "[0-9]+", "#")),
    )
    return df.select(
        F.col(id_col),
        cleaned.alias("scrubbed"),
        F.md5(cleaned).alias("scrubbed_fp"),
    )


#: PII patterns in the Java-regex ∩ RE2 portable subset (character classes,
#: bounded quantifiers, non-capturing groups — no lookaround, no backrefs),
#: so Spark (java.util.regex) and any RE2 engine (DuckDB, Go, C++) match the
#: SAME spans. Applied in tuple order; counts are measured per pattern on
#: the ORIGINAL text, redaction is sequential.
#: one valid IPv4 octet, 0–255 with no leading-zero requirement relaxed
#: (alternation + bounded classes only — still Java ∩ RE2 portable); the
#: r07 ADVICE item: \d{1,3} matched 999.999.999.999 and version-like
#: strings, inflating n_ipv4 and over-redacting
_IPV4_OCTET = r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"

PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", rf"\b{_IPV4_OCTET}(?:\.{_IPV4_OCTET}){{3}}\b", "<IP>"),
    ("phone", r"\+\d(?:[ -]?\d){6,14}", "<PHONE>"),
)


def pii_columns(text_col: str = "text") -> dict[str, Column]:
    """Per-pattern match counts + the sequentially redacted text. One
    projection, no UDFs — regexp_extract_all/regexp_replace run inside
    whole-stage codegen."""
    cols: dict[str, Column] = {}
    scrubbed = F.col(text_col)
    for name, pattern, token in PII_PATTERNS:
        cols[f"n_{name}"] = F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
        ).cast("long")
        scrubbed = F.regexp_replace(scrubbed, pattern, token)
    cols["scrubbed"] = scrubbed
    return cols


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    cols = pii_columns(text_col)
    return df.select(
        F.col(id_col),
        *[cols[f"n_{name}"].alias(f"n_{name}") for name, _, _ in PII_PATTERNS],
        F.md5(cols["scrubbed"]).alias("scrubbed_fp"),
    )


def token_chunks(
    text_col: str = "text", width: int = 10
) -> tuple[Column, Column, Column, Column]:
    """Fixed `width`-token chunking of the whitespace token stream — the
    "paragraph" granularity for boilerplate detection on a corpus without
    layout. Returns ``(toks, seq, chunk, chunk_toks)``: ``toks`` is the
    one-pass tokenization the CALLER must materialize as a column named
    ``__toks``; ``seq`` is the chunk-index array to explode (as ``__ci``);
    ``chunk``/``chunk_toks`` are per-chunk O(width) slices of the
    MATERIALIZED ``__toks`` attribute. The pre-r11 shape sliced a fresh
    ``tokens(text)`` expression per chunk row, re-splitting the whole
    document once per chunk per expression — O(doc²/width) per doc
    (projection expressions get no CSE); slicing the attribute makes the
    chunk pass linear and keeps the token array inside one codegen stage
    (it must be projected away before any exchange)."""
    toks = tokens(F.col(text_col))
    mat = F.col("__toks")
    n_chunks = F.floor((F.size(mat) + (width - 1)) / width).cast("int")
    seq = F.sequence(F.lit(0), n_chunks - 1)
    sl = F.slice(mat, F.col("__ci") * width + 1, width)
    chunk = F.array_join(sl, " ")
    chunk_toks = F.size(sl)
    return toks, seq, chunk, chunk_toks


def length_quantiles(
    df: DataFrame, qs: tuple[float, ...] = (0.5, 0.9, 0.99), text_col: str = "text"
) -> DataFrame:
    """Exact corpus length quantiles by rank: q-th quantile = the n_tokens at
    sorted position ceil(q·N), no interpolation — a definition every engine
    reproduces bit-for-bit. Computed from the cumulative length histogram
    (quantile value = smallest length whose running count reaches the target
    position): the only window runs over distinct lengths — a bounded-domain
    table — never over the corpus, so no single-partition global rank at
    scale. The corpus total rides along as a broadcast 1-row cross join, so
    the whole computation is one lazy plan — no mid-plan collect, no extra
    job, and the plan stays reusable."""
    from pyspark.sql import Window

    hist = (
        df.select(F.size(tokens(F.col(text_col))).alias("n_tokens"))
        .groupBy("n_tokens")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("n_tokens").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    totals = cum.agg(F.max("cum").alias("total"))
    picks = [
        F.min(
            F.when(
                F.col("cum")
                >= F.greatest(
                    F.lit(1).cast("bigint"),
                    F.ceil(F.lit(q) * F.col("total")).cast("bigint"),
                ),
                F.col("n_tokens"),
            )
        ).alias(f"p{int(q * 100)}")
        for q in qs
    ]
    return cum.crossJoin(F.broadcast(totals)).agg(*picks)


def token_length_histogram(
    df: DataFrame, bucket_width: int = 10, text_col: str = "text"
) -> DataFrame:
    """Distribution of document lengths in tokens, bucketed by
    ``bucket_width`` — the corpus-shape profile used to pick sequence-length
    cutoffs. One explode-free pass: length per doc, integer-divide, count."""
    n = F.size(tokens(F.col(text_col)))
    # pure integer arithmetic: float-division-then-cast rounds in some
    # engines and truncates in others
    bucket = n - n % bucket_width
    return (
        df.select(bucket.alias("bucket_lo"))
        .groupBy("bucket_lo")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def tfidf_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k characteristic terms per document by tf·idf, with a RATIONAL
    idf — tf · (N − df + 0.5)/(df + 0.5), the BM25 idf argument without the
    log — so every score is one exact integer-derived division and both
    engines produce bit-identical doubles (ln is not correctly-rounded
    across libms, so a log-idf cannot be oracle-hashed).

    Plan shape: explode → (doc, term) hash-agg for tf → term hash-agg for
    df → shuffle join on term (vocab-sized — at corpus scale this is the
    canonical term-partitioned join, skew-bounded by stopword df being high
    but per-term rows equal to that term's doc count) → broadcast 1-row
    N → per-doc window top-k. Ties break on the term for determinism."""
    from pyspark.sql import Window

    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("t"))
    tf = tok.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    total = df.agg(F.countDistinct(id_col).alias("n_docs"))
    score = F.col("tf") * (
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    scored = (
        tf.join(dfreq, ["t"])
        .crossJoin(F.broadcast(total))
        .withColumn("tfidf", score)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("t").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(id_col, F.col("t").alias("term"), "tf", "df", "tfidf", "rank")
    )


# --- BPE merge training --------------------------------------------------------


def bpe_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The Sennrich 2016 reduction that makes distributed BPE training
    tractable: collapse the corpus to its word-frequency VOCABULARY before
    any merge iteration touches it. One corpus scan + one word hash
    aggregate; every subsequent iteration runs on vocab rows (|distinct
    words|, millions at 100 TB — not corpus tokens, trillions). Each word
    becomes its character-symbol array plus the classic ``</w>``
    end-of-word marker, so merges can learn suffixes without crossing
    word boundaries."""
    words = df.select(F.explode(tokens(F.col(text_col))).alias("w"))
    return words.groupBy("w").agg(F.count(F.lit(1)).alias("n")).select(
        F.concat(
            F.regexp_extract_all(F.col("w"), F.lit("."), 0),
            F.array(F.lit("</w>")),
        ).alias("syms"),
        "n",
    )


def bpe_greedy_merge(symbols: Column, left: Column, right: Column) -> Column:
    """Apply ONE learned merge (left, right) to a symbol array with EXACT
    leftmost non-overlapping (greedy) semantics, entirely row-locally — no
    window, no shuffle, nothing sequential across rows.

    Greedy selection looks inherently serial (a match is skipped when the
    previous overlapping match fired), but it closed-forms: candidate
    start positions are strictly increasing, overlaps only chain through
    CONSECUTIVE candidates (p, p+1, ...), and within each maximal
    consecutive run greedy keeps every other candidate from the run's
    start. Runs are found without iteration by the gaps-and-islands key
    cand[j] - j (constant within a run, strictly increasing across runs),
    so selection is a parity test against the key's first occurrence.
    For heterogeneous pairs (left != right) candidates can never be
    consecutive and every candidate merges — the common case degenerates
    to a plain filter. HOF lambdas here are interpreted, but they run on
    VOCAB rows over per-word arrays (tens of symbols), not on the corpus —
    and only on the sliver of words that CONTAIN the pair: a codegen'd
    delimiter-joined string containment test short-circuits the ~99% of
    vocab rows a given merge never touches. The delimiter \\x1f CAN occur
    inside a symbol (U+001F is not regex \\s whitespace, so it survives
    whitespace tokenization — r14 ADVICE corrected the earlier claim);
    a collision only ever WIDENS the prefilter (a false-positive
    containment falls through to the exact candidate scan below, which
    compares whole symbols and merges nothing), so results stay correct.
    Any refactor must preserve that direction: the containment test may
    only ever admit extra rows, never be relied on to prove a pair
    occurs."""
    sep = "\x1f"
    joined = F.concat(F.lit(sep), F.concat_ws(sep, symbols), F.lit(sep))
    needle = F.concat(F.lit(sep), left, F.lit(sep), right, F.lit(sep))
    return F.when(
        joined.contains(needle), _bpe_apply_merge(symbols, left, right)
    ).otherwise(symbols)


def _bpe_apply_merge(symbols: Column, left: Column, right: Column) -> Column:
    """The full greedy-selection path of `bpe_greedy_merge` (see its
    docstring for the closed form); evaluated only when the pair is known
    to occur in this word."""
    n = F.size(symbols)
    cands = F.when(
        n >= 2,
        F.filter(
            F.sequence(F.lit(1), n - 1),
            lambda i: (F.element_at(symbols, i) == left)
            & (F.element_at(symbols, i + 1) == right),
        ),
    ).otherwise(F.array().cast("array<int>"))
    ckey = F.transform(cands, lambda x, j: x - j)
    sel = F.filter(
        cands,
        lambda x, j: (
            (j - (F.array_position(ckey, x - j) - F.lit(1))) % 2
        )
        == 0,
    )
    merged = F.concat(left, right)
    rebuilt = F.transform(
        symbols,
        lambda s, i0: F.when(F.array_contains(sel, i0 + 1), merged)
        .when(F.array_contains(sel, i0), F.lit(None).cast("string"))
        .otherwise(s),
    )
    return F.filter(rebuilt, lambda s: s.isNotNull())


def bpe_merge_steps(
    df: DataFrame, n_merges: int, text_col: str = "text"
) -> DataFrame:
    """Distributed byte-pair-encoding merge training (Sennrich, Haddow &
    Birch 2016; the tokenizer-training algorithm behind GPT-2/RoBERTa
    vocabularies), unrolled for ``n_merges`` iterations: per step, ONE
    (left,right) hash aggregate over the vocabulary's adjacent symbol
    pairs (weighted by word frequency, map-side combined), a 1-row
    argmax (count desc, then lexicographic — deterministic across
    engines and partitionings), broadcast back, and an exact greedy
    row-local merge (`bpe_greedy_merge`). Returns the learned merge
    table: (step, lhs, rhs, merged, pair_count).

    Scale: the corpus is touched ONCE (`bpe_vocab`); iterations are
    vocab-scale. The per-step argmax is COLLECTED (one row per step —
    the sanctioned driver-side training-statistic collect class, exactly
    how every real BPE trainer holds its merge table) and re-enters the
    next step's plan as string LITERALS, so the merge map constant-folds
    in codegen and no step ever re-derives an earlier step's argmax — a
    pure-lineage union of the per-step bests was measured 3-10× slower
    purely on O(steps²) recomputed exchanges. A deployment training ~30k
    merges runs this same loop and persists the vocab every few hundred
    steps to cap lineage depth."""
    rows, _ = _bpe_train(df, n_merges, text_col)
    spark = df.sparkSession
    return spark.createDataFrame(
        rows, "step int, lhs string, rhs string, merged string, pair_count long"
    )


def _bpe_train(
    df: DataFrame, n_merges: int, text_col: str
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """The shared train loop: returns (merge rows, final merged vocab)."""
    vocab = bpe_vocab(df, text_col)
    rows: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        width = F.size(F.col("syms")) - 1
        z = F.when(
            F.size(F.col("syms")) >= 2,
            F.arrays_zip(
                F.slice(F.col("syms"), 1, width),
                F.slice(F.col("syms"), 2, width),
            ),
        )
        pc = (
            vocab.select("n", F.explode(z).alias("p"))
            .select(
                "n",
                F.col("p")["0"].alias("lhs"),
                F.col("p")["1"].alias("rhs"),
            )
            .groupBy("lhs", "rhs")
            .agg(F.sum("n").alias("pair_count"))
        )
        best = (
            pc.orderBy(
                F.col("pair_count").desc(),
                F.col("lhs").asc(),
                F.col("rhs").asc(),
            )
            .limit(1)
            .first()
        )
        if best is None:  # vocabulary fully merged — nothing left to learn
            break
        lhs, rhs, cnt = best["lhs"], best["rhs"], best["pair_count"]
        rows.append((step, lhs, rhs, lhs + rhs, cnt))
        # localCheckpoint truncates lineage EVERY step — without it the
        # stacked merge projections are exponential in the OPTIMIZER:
        # CollapseProject inlines each layer's full expression at every
        # `syms` reference of the next (~10-30 refs/layer), and by 8
        # layers Catalyst spins minutes on a 31-row vocab (measured; an
        # explode over the stack multiplies it further). Non-eager, so
        # materialization rides the next step's argmax job; content is
        # deterministic, so collected merges and the oracle replay are
        # unaffected. Reliability caveat (r14 ADVICE): localCheckpoint
        # blocks live only on executors, so a lost executor plus the
        # truncated lineage makes the job unrecoverable. Fine on
        # local[n]; a ~30k-merge cluster deployment should truncate via
        # reliable checkpoint() or periodic persisted-parquet snapshots
        # of the vocab instead.
        vocab = vocab.select(
            bpe_greedy_merge(
                F.col("syms"), F.lit(lhs), F.lit(rhs)
            ).alias("syms"),
            "n",
        ).localCheckpoint(eager=False)
    return rows, vocab


def bpe_encode_stats(
    df: DataFrame, n_merges: int, text_col: str = "text"
) -> DataFrame:
    """The trained tokenizer APPLIED: encode the vocabulary with the
    n_merges learned merges and report the corpus-level effect in one
    row — total words, total emitted subword tokens, distinct symbol
    sequences (encoded vocab size), distinct subword types (the
    tokenizer's effective vocabulary), and fertility (subwords per word,
    weighted by word frequency — the compression the merges bought over
    raw characters). Two 1-row aggregates over the final vocab (whole
    rows + exploded symbols), broadcast-crossed; encoding itself is the
    same literal-folded row-local merge chain training used."""
    _, vocab = _bpe_train(df, n_merges, text_col)
    totals = vocab.agg(
        F.sum("n").alias("total_words"),
        F.sum(F.col("n") * F.size(F.col("syms")))
        .cast("long")
        .alias("total_subwords"),
        F.countDistinct(F.col("syms")).alias("vocab_size"),
    )
    types = vocab.select(
        F.explode(F.col("syms")).alias("s")
    ).agg(F.countDistinct(F.col("s")).alias("subword_types"))
    return totals.crossJoin(F.broadcast(types)).select(
        "total_words",
        "total_subwords",
        "vocab_size",
        "subword_types",
        (
            F.col("total_subwords").cast("double")
            / F.col("total_words").cast("double")
        ).alias("fertility"),
    )


#: quantization grid for `token_lr_classifier`'s two float SUMs (per-doc
#: logits, per-bucket gradients) — the `similarity.KMEANS_Q` idiom:
#: per-term products round onto this grid and fold as BIGINTs, so every
#: distributed SUM in the training loop is associative (order-proof) and
#: both engines add the same integers regardless of partitioning.
LR_Q = 1_000_000


def token_lr_classifier(
    docs: DataFrame,
    label: Column,
    buckets: int = 64,
    steps: int = 4,
    eta: float = 4.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """fastText-style model-based document filter (Joulin et al. 2016,
    "Bag of Tricks for Efficient Text Classification" — the cheap linear
    classifier CCNet/LLaMA-class pipelines train on labeled exemplars to
    screen a corpus): unigrams hash into ``buckets`` features
    (normalized counts, then per-bucket STANDARDIZED — the diagonal
    preconditioning that makes few-step full-batch gradient descent
    actually converge on ill-scaled text features; unpreconditioned GD
    stalls at the majority class on this corpus), a logistic-loss linear
    model trains by ``steps`` unrolled full-batch gradient iterations
    against ``label``, and every document is scored by the trained
    model. Returns (id, is_target, score, predicted) per doc.

    Scale shape: the sparse (doc, bucket, x) frame is token explode →
    one hash agg → one per-doc window sum (the `dsir_weights` shape,
    linear in corpus tokens); bucket means/stds are ONE tiny hash agg of
    decimal-exact sums over it. Standardization densifies the frame to
    corpus × (buckets+1) rows — linear with a small constant at this D;
    a 100 TB run additionally keeps it SPARSE by folding the dense part
    into the model (z = Σ_present (w_b/σ_b)·x − Σ_b w_b μ_b/σ_b +
    w_bias, so only present buckets are touched). The standardized
    frame is ``localCheckpoint``ed ONCE before the loop (the
    `_bpe_train`/`build_ivf_index` lineage-cut idiom): the unrolled
    plan references it 2·steps+1 times (logits + gradient per step,
    final scoring), and without the cut Catalyst re-executes the whole
    corpus-scan → explode → shuffle chain at every reference — the
    difference between 1 and ~9 corpus scans per training run. Each
    training step is then ONE broadcast join of the (buckets+1)-row
    model + two quantized hash aggregates (per-doc logits, per-bucket
    gradients) over the materialized frame; the model is a
    broadcastable constant like a k-means codebook, nothing is ever
    pairwise, and scoring is the same join + one agg, map-side
    combined. The model frame is ALSO lineage-cut once per step:
    w_i references w_{i-1} twice (update join side + the gradient's
    logits), so the uncut unrolled plan embeds 2^steps copies of the
    step-0 chain — exponential in steps (measured 28 s at steps=8 on
    sf0.1), linear with the cut (6 s).

    Cross-engine exactness, term by term: bucket moments fold
    round-to-grid DECIMAL sums (exact, overflow-free); σ uses ``sqrt``
    (IEEE-754 requires correct rounding for sqrt, so it is bit-identical
    across engines — unlike ``exp``, which is why the sigmoid is the
    ALGEBRAIC surrogate σ̃(z) = 0.5 + z / (2·(1+|z|)): monotone,
    bounded, exactly replayable with +,*,/,abs; a last-ulp ``exp``
    difference would compound through ``steps`` weight updates); the two
    float SUMs of the loop quantize each term onto the `LR_Q` grid and
    fold BIGINTs; μ and σ round to 6 decimals; the weight update itself
    is plain IEEE arithmetic on identical inputs."""
    feat, nrow, _stats = _lr_features(docs, label, buckets, id_col, text_col)
    w = _lr_gradient_descent(feat, nrow, buckets, steps, eta, id_col)
    return _lr_logits(feat, w, id_col).select(
        id_col,
        "is_target",
        F.round(_lr_sigmoid(F.col("z")), 6).alias("score"),
        (F.col("z") > 0.0).alias("predicted"),
    )


def _lr_sigmoid(z: Column) -> Column:
    """The ALGEBRAIC sigmoid surrogate σ̃(z) = 0.5 + z / (2·(1+|z|)) —
    monotone, bounded, cross-engine exact (+,*,/,abs only; see
    `token_lr_classifier`'s exactness notes for why not ``exp``)."""
    return F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))


def _lr_logits(feat: DataFrame, w: DataFrame, id_col: str) -> DataFrame:
    """Per-doc logit under model ``w``: ONE broadcast join of the
    (buckets+1)-row model + one LR_Q-quantized BIGINT fold (order-proof)."""
    return (
        feat.join(F.broadcast(w), "bucket")
        .groupBy(id_col, "is_target")
        .agg(
            F.sum(
                F.round(F.col("xs") * F.col("w") * LR_Q, 0).cast("long")
            ).alias("zq")
        )
        .select(
            id_col,
            "is_target",
            (F.col("zq").cast("double") / F.lit(float(LR_Q))).alias("z"),
        )
    )


def _lr_features(
    docs: DataFrame,
    label: Column,
    buckets: int,
    id_col: str,
    text_col: str,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared feature build for `token_lr_classifier`/`token_lr_train`:
    returns (feat, n_docs, stats) — the lineage-cut dense standardized
    feature frame (id, is_target, bucket, xs), the lineage-cut 1-row
    corpus count, and the per-bucket (mu, sd) moments frame."""
    spark = docs.sparkSession
    from pyspark.sql import Window

    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("bigint")
        % buckets
    )
    pairs = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).select(id_col, bucket.alias("bucket"))
    counts = pairs.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_doc = Window.partitionBy(id_col)
    sparse = counts.select(
        id_col,
        "bucket",
        (
            F.col("c").cast("double") / F.sum("c").over(w_doc).cast("double")
        ).alias("x"),
    )
    # corpus count, referenced by the moments chain AND every one of the
    # `steps` weight updates — collected ONCE as an exact integer and used
    # as a LITERAL (r19: the previous lineage-cut 1-row frame paid a
    # checkpoint creation plus a crossJoin per consumer; a count is one
    # cheap job and a float literal is free everywhere). Exact: count →
    # float is lossless far beyond any corpus size here, and the division
    # it feeds is the identical IEEE op on identical values.
    n_docs = float(docs.count())
    nrow = F.lit(n_docs).alias("n_docs")
    # per-bucket moments over ALL docs (absent rows contribute 0, so the
    # sparse sums ARE the dense sums); decimal folds -> order-proof
    stats = (
        sparse.groupBy("bucket")
        .agg(
            F.sum(F.round(F.col("x"), 6).cast("decimal(18,6)")).alias("sx"),
            F.sum(
                F.round(F.col("x") * F.col("x"), 12).cast("decimal(24,12)")
            ).alias("sxx"),
        )
        .select(
            "bucket",
            F.round(F.col("sx").cast("double") / nrow, 6).alias("mu"),
            F.col("sxx").cast("double").alias("__sxx"),
            nrow,
        )
        .select(
            "bucket",
            "mu",
            F.round(
                F.sqrt(
                    F.greatest(
                        F.col("__sxx") / F.col("n_docs")
                        - F.col("mu") * F.col("mu"),
                        F.lit(0.0),
                    )
                )
                + F.lit(1e-6),
                6,
            ).alias("sd"),
        )
    )
    # dense standardized frame: every (doc, bucket) pair + the bias row
    labeled = docs.select(F.col(id_col), label.alias("is_target"))
    grid = labeled.crossJoin(
        F.broadcast(
            spark.range(buckets).select(F.col("id").alias("bucket"))
        )
    )
    feat = (
        grid.join(sparse, [id_col, "bucket"], "left")
        .join(F.broadcast(stats), "bucket")
        .select(
            id_col,
            "is_target",
            "bucket",
            (
                (F.coalesce(F.col("x"), F.lit(0.0)) - F.col("mu"))
                / F.col("sd")
            ).alias("xs"),
        )
        .unionByName(
            labeled.select(
                id_col,
                "is_target",
                F.lit(buckets).cast("bigint").alias("bucket"),
                F.lit(1.0).alias("xs"),
            )
        )
        # lineage cut (VERDICT r16): compute the corpus-scan → explode →
        # window → grid-join chain ONCE; every logits()/gradient
        # reference reads the materialized frame. Non-eager, so
        # materialization rides the first step's job; result-identical
        # (same reliability caveat as _bpe_train's cut above).
        .localCheckpoint(eager=False)
    )
    return feat, n_docs, stats


def _lr_gradient_descent(
    feat: DataFrame,
    n_docs: float,
    buckets: int,
    steps: int,
    eta: float,
    id_col: str,
) -> DataFrame:
    """``steps`` unrolled full-batch gradient iterations over the
    materialized feature frame; returns the trained (bucket, w) model,
    buckets+1 rows (bias last)."""
    spark = feat.sparkSession
    w = spark.range(buckets + 1).select(
        F.col("id").alias("bucket"), F.lit(0.0).alias("w")
    )
    for _ in range(steps):
        resid = _lr_logits(feat, w, id_col).select(
            id_col,
            (
                F.when(F.col("is_target"), F.lit(1.0)).otherwise(F.lit(0.0))
                - _lr_sigmoid(F.col("z"))
            ).alias("r"),
        )
        grad = (
            feat.join(resid, id_col)
            .groupBy("bucket")
            .agg(
                F.sum(
                    F.round(F.col("xs") * F.col("r") * LR_Q, 0).cast("long")
                ).alias("gq")
            )
        )
        w = (
            w.join(grad, "bucket", "left")
            .select(
                "bucket",
                (
                    F.col("w")
                    + F.lit(eta)
                    * (
                        F.coalesce(F.col("gq"), F.lit(0)).cast("double")
                        / F.lit(float(LR_Q))
                    )
                    / F.lit(n_docs)
                ).alias("w"),
            )
            # per-step lineage cut on the (buckets+1)-row model, the
            # `_bpe_train` idiom. WITHOUT it the unrolled plan is
            # EXPONENTIAL in `steps`: w_i references w_{i-1} twice (the
            # update's join side AND the gradient's logits), so plan(w_i)
            # embeds 2^i copies of the step-0 chain — measured 28 s at
            # steps=8 vs 5.5 s at steps=4 on sf0.1 pre-cut. With the cut,
            # each step is exactly two aggregates over the materialized
            # feature frame: linear, the shape the docstring promises.
            # (r19: a per-step driver-side collect was measured 2-5×
            # SLOWER — `steps` separate fold jobs lose to one fused job;
            # the non-eager checkpoint keeps training a single job.)
            .localCheckpoint(eager=False)
        )
    return w


def stopword_bucket_injectivity(
    docs: DataFrame,
    widths: tuple[int, ...],
    stopwords: tuple[str, ...] = EN_STOPWORDS,
    text_col: str = "text",
) -> DataFrame:
    """The r17 bucket-sweep's deployment rule, made an operator (r17
    VERDICT item 3): before training a hashed-feature classifier whose
    label signal lives in specific tokens (here the stopword list), check
    the hash map's INJECTIVITY on those label-bearing tokens against the
    whole corpus vocabulary at each candidate width, and pick the
    smallest collision-free one. The sweep's finding: accuracy is
    STEP-shaped in width because one md5-low-bit collision
    (`the` ⨯ `join`) survives every power-of-two modulus up to 1024
    (0.84 → 0.97/0.98 once separated; the sweep's coarse grid located
    the step at its next point 4096 — this check on the full grid finds
    the collision separates at 2048, with identical accuracy) — so the
    right width is not a capacity knob to tune by loss, it is a
    collision property to CHECK.

    A stopword's bucket is CONTAMINATED at width W iff any other vocab
    token (stopword or not) shares ``h % W`` with it — then the feature
    the model must weight is a mixture and the label signal is diluted.
    Emits one row per width: (width, n_stop_buckets, n_contaminated,
    injective, picked) with ``picked`` true on the smallest injective
    width (no width injective ⇒ no row picked — the caller must widen
    the grid, not silently take the largest).

    Scale shape: ONE token scan → vocab distinct (|V| rows — vocabulary,
    not corpus, sized), the 32-bit token hash computed once, then a
    |V|·|widths| explode into one map-side-combined hash agg to
    ≤ |widths|·|stopwords| output rows. Nothing is pairwise: collisions
    are counted per (width, bucket) group, never by joining tokens
    against tokens."""
    hash32 = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast(
        "bigint"
    )
    vocab = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .distinct()
        .select(
            "tok", hash32.alias("h"), F.col("tok").isin(*stopwords).alias("is_stop")
        )
    )
    per_width = vocab.select(
        "h",
        "is_stop",
        F.explode(
            F.array(*[F.lit(w) for w in widths]).cast("array<int>")
        ).alias("width"),
    )
    buckets = per_width.groupBy("width", (F.col("h") % F.col("width")).alias("b")).agg(
        F.count(F.lit(1)).alias("n_toks"),
        F.sum(F.col("is_stop").cast("int")).alias("n_stop"),
    )
    stats = (
        buckets.filter(F.col("n_stop") >= 1)
        .groupBy("width")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_stop_buckets"),
            F.count(F.when(F.col("n_toks") > 1, 1))
            .cast("long")
            .alias("n_contaminated"),
        )
        .withColumn("injective", F.col("n_contaminated") == 0)
    )
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    min_inj = F.min(
        F.when(F.col("injective"), F.col("width"))
    ).over(w_all)
    return stats.select(
        "width",
        "n_stop_buckets",
        "n_contaminated",
        "injective",
        # coalesce: no injective width ⇒ picked FALSE everywhere, not NULL
        F.coalesce(F.col("width") == min_inj, F.lit(False)).alias("picked"),
    )


def token_lr_train(
    docs: DataFrame,
    label: Column,
    buckets: int = 64,
    steps: int = 4,
    eta: float = 4.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """`token_lr_classifier`'s TRAINING half, split out for the
    build-once / score-many deployment (the `build_pq_index` →
    `pq_topk_probe` pattern): runs the same feature build + ``steps``
    gradient iterations and returns the complete serving artifact — a
    (buckets+1)-row frame (bucket, w, mu, sd) carrying the trained
    weight AND the standardization moments each bucket was trained
    under. The bias row (bucket = ``buckets``) stores (mu, sd) = (0, 1),
    under which the dense scorer's (0 − mu)/sd would read 0 —
    `token_lr_score` therefore emits the bias feature explicitly as the
    constant 1, exactly as training did. Persist this frame (it is a
    broadcastable constant, a k-means-codebook analogue) and serve with
    `token_lr_score`; byte-identical scores to the train-inline
    classifier are guaranteed by the shared quantized folds."""
    feat, nrow, stats = _lr_features(docs, label, buckets, id_col, text_col)
    w = _lr_gradient_descent(feat, nrow, buckets, steps, eta, id_col)
    return w.join(F.broadcast(stats), "bucket", "left").select(
        "bucket",
        "w",
        F.coalesce(F.col("mu"), F.lit(0.0)).alias("mu"),
        F.coalesce(F.col("sd"), F.lit(1.0)).alias("sd"),
    )


def token_lr_score(
    docs: DataFrame,
    model: DataFrame,
    label: Column,
    buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    check_model: bool = True,
) -> DataFrame:
    """`token_lr_classifier`'s SERVING half: score ``docs`` under a
    model trained by `token_lr_train` — NO gradient step, no moment
    estimation, no Lloyd-class iteration anywhere in the plan, and no
    densification: the standardization's absent-bucket terms are folded
    into per-bucket model constants (see the inline derivation), so the
    scored frame is O(corpus tokens) — never the training loop's corpus
    × (buckets+1) dense grid — while every emitted integer is EXACTLY
    the one the dense fold produces. ONE corpus scan builds the sparse
    normalized counts, the broadcast (buckets+1)-row ``model`` supplies
    (w, mu, sd), and ONE map-side-combined quantized fold per doc plus a
    1-row model aggregate produce the logit — the same arithmetic, in
    the same LR_Q BIGINT grid, as the train-inline classifier's final
    pass, so scores are byte-identical to training-time scoring of the
    same corpus (pinned by the probe-equivalence test).
    ``label`` is evaluated only to EMIT ``is_target`` (schema parity
    with `token_lr_classifier` and accuracy audits); it never influences
    the score. ``buckets`` must match the trained model — guarded by a
    row-count check on the (tiny) model frame, because a mismatched hash
    modulus would silently score against the wrong feature space.
    ``check_model=False`` skips that guard — it is a per-call Spark job
    in a serving path (r17 VERDICT), so callers whose ``buckets`` was
    READ FROM the model artifact's own meta (`plans.llmdata.
    _lr_model_buckets`) pass False: a value sourced from the artifact
    cannot mismatch it."""
    if check_model:
        n_model = model.count()  # tiny frame; guards silent feature-space skew
        if n_model != buckets + 1:
            raise ValueError(
                f"model has {n_model} rows; expected buckets+1 = {buckets + 1}"
            )
    from pyspark.sql import Window

    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("bigint")
        % buckets
    )
    pairs = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).select(id_col, bucket.alias("bucket"))
    counts = pairs.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_doc = Window.partitionBy(id_col)
    sparse = counts.select(
        id_col,
        "bucket",
        (
            F.col("c").cast("double") / F.sum("c").over(w_doc).cast("double")
        ).alias("x"),
    )
    labeled = docs.select(F.col(id_col), label.alias("is_target"))
    # SPARSE fold, bit-identical to the dense one (the docstring's 100 TB
    # shape, made exact): the dense zq is Σ_b round(xs_b·w_b·Q) + bias
    # with xs_b = (x_b − mu_b)/sd_b and x_b = 0 for absent buckets. Each
    # absent bucket therefore contributes the PER-BUCKET CONSTANT
    # t0_b = round(((0 − mu_b)/sd_b)·w_b·Q), so
    #   zq = Σ_present [round(xs·w·Q) − t0_b] + Σ_all_b t0_b + bias_term
    # — every term is the SAME integer the dense grid would have produced
    # (rounding is per bucket, absent terms are exactly t0_b), but only
    # token-support rows are touched: the scored frame is O(corpus
    # tokens), never corpus × (buckets+1). Σ_all t0_b + bias_term is one
    # (buckets+1)-row aggregate of the broadcast model (z0q below).
    t0 = F.round(
        ((F.lit(0.0) - F.col("mu")) / F.col("sd")) * F.col("w") * LR_Q, 0
    ).cast("long")
    bias_term = F.round(F.lit(1.0) * F.col("w") * LR_Q, 0).cast("long")
    z0 = model.agg(
        F.sum(
            F.when(F.col("bucket") < buckets, t0).otherwise(bias_term)
        ).alias("z0q")
    )
    deltas = (
        sparse.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.round(
                    ((F.col("x") - F.col("mu")) / F.col("sd"))
                    * F.col("w")
                    * LR_Q,
                    0,
                ).cast("long")
                - t0
            ).alias("dq")
        )
    )
    z = (
        labeled.join(deltas, id_col, "left")
        .crossJoin(F.broadcast(z0))
        .select(
            id_col,
            "is_target",
            (
                (F.coalesce(F.col("dq"), F.lit(0)) + F.col("z0q"))
                .cast("double")
                / F.lit(float(LR_Q))
            ).alias("z"),
        )
    )
    return z.select(
        id_col,
        "is_target",
        F.round(_lr_sigmoid(F.col("z")), 6).alias("score"),
        (F.col("z") > 0.0).alias("predicted"),
    )
