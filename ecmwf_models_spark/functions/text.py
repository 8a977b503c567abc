"""Text analysis + deduplication operators for large-scale training-data
pipelines, all Spark built-ins in the hot path (JVM-side, codegen'd).

Families:
  exact dedup          sha2(text) groupBy
  MinHash + LSH        word-shingles -> k independent xxhash64 mins ->
                       banded bucket join -> verified Jaccard
  SimHash              64-bit sign-of-weighted-bit-sums fingerprint
  n-gram Jaccard       set-similarity join via shingle-inverted index
  language ID          stopword-hit n-gram heuristic (portable to SQL)
  quality scoring      length / punctuation / stopword / uppercase ratios
  token counting       whitespace + BPE-ish regex
  fingerprinting       min-of-shingle-hash (winnowing-style, md5-portable)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_RE = r"[a-z0-9]+"
BPE_RE = r"\w+|[^\w\s]"

# tiny per-language stopword marker sets for the n-gram heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "y", "es", "los"],
    "zh": ["de", "shi", "le", "zai", "he"],
}

STOPWORDS = LANG_MARKERS["en"]


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(F.lower(c), r"[^a-z0-9]+"), lambda t: t != ""
    )


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array column: built-ins only
    (transform over a sequence of start offsets + slice + concat)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


# ------------------------------------------------------------- exact dedup

def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One surviving doc_id (the min) per distinct text hash + group size.
    Hash-groupBy: partial aggregation map-side, scales linearly."""
    return (
        docs.withColumn("text_hash", F.sha2(F.col(text_col), 256))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ------------------------------------------------------------ MinHash/LSH

def minhash_signature(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """doc_id + array<long> MinHash signature: explode shingles once, then
    k independent families as min(xxhash64(shingle, seed_i)) hash
    aggregates — the canonical distributed MinHash.

    Deliberately NOT array_min(transform(shingles, ...)) over an array
    column: ProjectCollapse inlines the tokenize+shingle expression into
    every lambda body, so a 32-seed transform re-tokenizes each row 32x
    (and a downstream banding transform multiplies it again — measured
    100x+ blowup). The aggregate form computes shingles exactly once per
    row, stays whole-stage-codegen'd, and partial aggregation collapses
    each doc's shingles map-side before any shuffle (one row per doc per
    partition crosses the wire)."""
    sh = docs.select(
        "doc_id",
        F.explode(shingles(tokens(text_col), shingle_n)).alias("_s"),
    )
    per_doc = sh.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64("_s", F.lit(seed))).alias(f"_h{seed}")
            for seed in range(num_hashes)
        ]
    )
    return per_doc.select(
        "doc_id",
        F.array(*[f"_h{i}" for i in range(num_hashes)]).alias("signature"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 8
) -> DataFrame:
    """Band the signature, hash each band, self-join per (band, hash)
    bucket -> candidate pairs (doc_id_a < doc_id_b). The join key is the
    band hash, so only same-bucket docs ever meet — the standard LSH
    candidate generation, shuffle proportional to bucket sizes."""
    n = None  # rows per band derived from signature length at runtime
    banded = signatures.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(
                                F.col("signature"),
                                b * (F.size("signature") / bands).cast("int")
                                + 1,
                                (F.size("signature") / bands).cast("int"),
                            ),
                            lambda x: x.cast("string"),
                        ),
                    ),
                    b,
                ),
            )
        ).alias("band", "band_hash"),
    )
    _ = n
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    shingle_n: int = 3,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signature -> banded candidates ->
    exact Jaccard verification on candidates only."""
    sigs = minhash_signature(docs, text_col, num_hashes, shingle_n)
    cands = lsh_candidate_pairs(sigs, bands)
    return ngram_jaccard_verify(docs, cands, text_col, shingle_n, threshold)


# ---------------------------------------------------------------- SimHash

def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc. Explode tokens once, contribute +/-1 per bit
    per token, sum per (doc, bit), reassemble the bitmap — three narrow
    aggregations, no UDF."""
    tok = docs.select("doc_id", F.explode(tokens(text_col)).alias("tok"))
    tok = tok.withColumn("h", F.xxhash64("tok"))
    bit = tok.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.when(F.getbit("h", F.lit(b)) == 1, 1).otherwise(-1)
                    for b in range(64)
                ]
            )
        ).alias("bit", "contrib"),
    )
    sums = bit.groupBy("doc_id", "bit").agg(F.sum("contrib").alias("s"))
    # reassemble: shiftleft(1L, bit) with a column shift via SQL expr; the
    # sign bit uses subtraction to stay in long range under ANSI mode
    return sums.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("s") > 0,
                F.when(F.col("bit") == 63, F.lit(-(2**63))).otherwise(
                    F.expr("shiftleft(1L, bit)")
                ),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    docs: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash. Candidate generation blocks on 16-bit
    chunks (pigeonhole: <=3 differing bits over 4 chunks -> at least one
    chunk identical), then verifies full Hamming distance — no quadratic
    join."""
    sh = simhash64(docs, text_col)
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", i * 16).bitwiseAND(
                        F.lit(0xFFFF)
                    )
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return cands.withColumn(
        "hamming", hamming64(F.col("sh_a"), F.col("sh_b")).cast("int")
    ).where(F.col("hamming") <= max_hamming).select(
        "doc_id_a", "doc_id_b", "hamming"
    )


# -------------------------------------------------------- n-gram Jaccard

def ngram_jaccard_verify(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact Jaccard over word shingle SETS for given candidate pairs."""
    sets = docs.select(
        "doc_id",
        F.array_distinct(shingles(tokens(text_col), shingle_n)).alias("sh"),
    )
    j = (
        pairs.join(
            sets.select(
                F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sh_a")
            ),
            "doc_id_a",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sh_b")
            ),
            "doc_id_b",
        )
        .withColumn(
            "inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
                6,
            ),
        )
    )
    return j.where(F.col("jaccard") >= threshold).select(
        "doc_id_a", "doc_id_b", "jaccard"
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Set-similarity join: inverted index on shingles -> candidates that
    share >=1 shingle -> exact verify. At scale, prefix filtering or
    MinHash-LSH (above) bounds the candidate set; this exact variant is
    the correctness baseline."""
    sets = docs.select(
        "doc_id",
        F.array_distinct(shingles(tokens(text_col), shingle_n)).alias("sh"),
    )
    inv = sets.select("doc_id", F.explode("sh").alias("shingle"))
    a, b = inv.alias("a"), inv.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .distinct()
    )
    return ngram_jaccard_verify(docs, cands, text_col, shingle_n, threshold)


# -------------------------------------------------------------- analysis

def token_count(text: Column | str, bpe: bool = False) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    if bpe:
        return F.size(F.regexp_extract_all(c, F.lit(BPE_RE), 0))
    return F.size(tokens(c))


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts (word-boundary regexp count)."""
    c = F.col(text) if isinstance(text, str) else text
    lowered = F.lower(c)
    out = {}
    for lang, words in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(words) + r")\b"
        out[lang] = F.size(F.regexp_extract_all(lowered, F.lit(pat), 0))
    return out


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Predicted language = argmax of marker-word hits ('und' on tie-less
    zero). Deterministic tie-break: language order as in LANG_MARKERS."""
    scores = lang_scores(text_col)
    langs = list(scores.keys())
    struct = F.array(
        *[
            F.struct(
                scores[lang].alias("score"),
                F.lit(len(langs) - i).alias("prio"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    best = F.array_max(struct)
    return docs.withColumn(
        "pred_lang",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / uppercase / digit ratios + a
    composite quality score in [0,1]. Pure column expressions."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tok = token_count(c)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), 0))
    n_upper = F.size(F.regexp_extract_all(c, F.lit(r"[A-Z]"), 0))
    n_digit = F.size(F.regexp_extract_all(c, F.lit(r"[0-9]"), 0))
    n_stop = F.size(
        F.regexp_extract_all(
            F.lower(c), F.lit(r"\b(" + "|".join(STOPWORDS) + r")\b"), 0
        )
    )
    safe = F.greatest(n_chars, F.lit(1)).cast("double")
    out = (
        docs.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tok)
        .withColumn("punct_ratio", F.round(n_punct / safe, 6))
        .withColumn("upper_ratio", F.round(n_upper / safe, 6))
        .withColumn("digit_ratio", F.round(n_digit / safe, 6))
        .withColumn(
            "stopword_ratio",
            F.round(n_stop / F.greatest(n_tok, F.lit(1)).cast("double"), 6),
        )
        .withColumn(
            "mean_token_len",
            F.round(
                n_chars / F.greatest(n_tok, F.lit(1)).cast("double"), 6
            ),
        )
    )
    score = (
        F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0)) * 0.4
        + F.col("stopword_ratio") * 0.3
        + (1 - F.least(F.col("punct_ratio") * 5, F.lit(1.0))) * 0.2
        + (1 - F.least(F.col("digit_ratio") * 5, F.lit(1.0))) * 0.1
    )
    return out.withColumn("quality_score", F.round(score, 6))


def fingerprint(
    docs: DataFrame, text_col: str = "text", shingle_n: int = 3
) -> DataFrame:
    """Winnowing-style document fingerprint: minimum md5-derived hash over
    word shingles. md5 (not xxhash64) so external engines can reproduce it
    bit-for-bit (the DuckDB oracle)."""
    sh = shingles(tokens(text_col), shingle_n)
    h = F.transform(
        sh,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("decimal(20,0)"),
    )
    return docs.select(
        "doc_id", F.array_min(h).cast("decimal(20,0)").alias("fingerprint")
    )
