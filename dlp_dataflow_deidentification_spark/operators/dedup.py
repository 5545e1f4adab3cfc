"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's scope (its only dedup is the keep-one header combiner,
common/ResolveDuplicatesCombineFn.java:21-43); these are the first-class
corpus-dedup operators a 100 TB text pipeline needs. Hot paths are native
Spark expressions (higher-order array functions, xxhash64, bit ops); the one
deliberate exception is the minhash signature fold over materialized hashed
shingles, which is an Arrow-vectorized numpy kernel (guide §4.2 — the
num_hashes×|shingles| min-fold has no non-interpreted JVM form and no
per-row Python loop inside the batch).

Scale notes (100 TB):
  * exact_dedup     — one hash-aggregate shuffle on a 128-bit md5 digest of
                      the normalized text, computed map-side: shuffle volume
                      is 16 bytes + id per row, NOT the corpus text.
  * minhash_lsh     — shingle→signature is a narrow projection after one
                      groupBy(doc); banding multiplies rows by n_bands (small
                      constant); candidate generation is a self-join on
                      band_key carrying ONLY (id, band_key) — signatures are
                      re-attached to the (small) candidate set afterwards.
  * minhash_dedup   — production shape: LSH candidates + exact-Jaccard
                      verification on the candidate pairs only.
  * ngram_jaccard   — inverted-index self-join with a document-frequency cap
                      on shingles (a boilerplate shingle shared by 1e5 docs
                      would otherwise create a 1e10-row bucket); exact
                      Jaccard is computed on the FULL shingle sets of the
                      surviving candidate pairs.
  * simhash         — one 64-bit fingerprint per doc, candidates via
                      pigeonhole chunk-match, verify with bit_count(xor).
"""
from __future__ import annotations

import pandas as pd  # noqa: F401 — pandas_udf resolves 'pd.Series' hints via module globals
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PRIME = 2147483647  # 2^31 - 1, Mersenne prime for affine minhash perms


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per exact (normalized) text. Deterministic winner
    (unlike dropDuplicates' arbitrary row) so results are replay-stable.

    Groups by the 128-bit md5 of the normalized text — computed map-side, so
    the shuffle key is fixed-width and shuffle volume is independent of
    document length (the DuckDB oracle groups by the identical md5)."""
    # trim AFTER collapsing: leading/trailing whitespace becomes a single
    # edge space, which trim removes — texts differing only by a trailing
    # newline dedup together (interior-whitespace variants already did)
    norm = F.trim(F.lower(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return (
        df.withColumn("__digest", F.md5(norm))
        .groupBy("__digest")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .drop("__digest")
    )


# ---------------------------------------------------------------------------
# shingling + minhash
# ---------------------------------------------------------------------------


def shingles(text_col, n: int = 5):
    """Word n-gram shingle array (distinct), as a native Column expression.
    Guarded for short texts: Spark's sequence(1, k) DESCENDS when k < 1, so
    k is clamped and the whole gram array is empty for < n words.

    AD-HOC USE ONLY: the lambda below captures the ``split`` EXPRESSION, so
    Catalyst re-evaluates the full text split once per gram (no CSE inside
    higher-order functions) — ~10x slower than the two-projection form
    ``shingle_df`` uses, where the word array is a materialized column."""
    # drop empty tokens like shingle_df does: split of leading/trailing
    # whitespace yields "" words that would corrupt gram text (" hi") and
    # defeat the short-doc gate
    words = F.filter(F.split(F.lower(text_col), r"\s+"), lambda w: w != "")
    k = F.size(words) - F.lit(n - 1)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )
    return F.when(k >= 1, grams).otherwise(F.array().cast("array<string>"))


def shingle_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    hashed: bool = True,
) -> DataFrame:
    """(id, sh) distinct-shingle sets, empty-set rows dropped.

    ``hashed=True`` (default) stores xxhash64 of each gram (array<long>):
    set sizes and intersections are identical to the string form
    (collisions: ~n²/2⁶⁵, none observed at any test SF, and the driver's
    value-hash gate would catch one), while candidate-verification joins
    ship 8-byte elements instead of ~30-byte gram strings — 4x less shuffle
    at 100 TB.

    Plan shape (measured 10x): the word array is materialized as its own
    projection so the gram lambda references a cheap column (CollapseProject
    keeps a non-cheap producer referenced many times un-inlined) — embedding
    ``split`` in the lambda re-splits the text once per gram. The short-doc
    filter runs on word COUNT before grams exist: a ``size(sh) > 0`` filter
    would be pushed below the projection with the whole gram expression
    inlined, computing it twice per row."""
    # drop empty tokens (split of leading/trailing whitespace yields ""):
    # phantom empty words would join shingles and shift the >=n gate
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != ""
    )
    tmp = df.select(F.col(id_col).alias("id"), words.alias("__w")).filter(
        F.size("__w") >= shingle_n
    )
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("__w") - F.lit(shingle_n - 1)),
            lambda i: F.concat_ws(" ", F.slice(F.col("__w"), i, shingle_n)),
        )
    )
    if hashed:
        sh = F.transform(sh, lambda g: F.xxhash64(g))
    return tmp.select("id", sh.alias("sh"))


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


def _signatures_from_shingles(sh: DataFrame, num_hashes: int) -> DataFrame:
    """sh may carry hashed (long) or raw (string) shingles — either way each
    shingle contributes one base hash, permuted num_hashes times."""
    g = F.col("g")
    base = g if dict(sh.dtypes)["sh"] == "array<bigint>" else F.xxhash64(g)
    ex = sh.select("id", F.explode("sh").alias("g")).select(
        "id", F.pmod(base, F.lit(_PRIME)).alias("h")
    )
    aggs = []
    for i in range(num_hashes):
        a, b = _perm(i)
        aggs.append(F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(_PRIME))).alias(f"m{i}"))
    per = ex.groupBy("id").agg(*aggs)
    return per.select("id", F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig"))


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
    return _signatures_from_shingles(shingle_df(df, text_col, id_col, shingle_n), num_hashes)


def _signatures_from_hashed_arrays(sh: DataFrame, num_hashes: int) -> DataFrame:
    """Signatures over a MATERIALIZED hashed-shingle table (no explode, no
    shuffle). Round 6: one vectorized Arrow pandas UDF instead of
    num_hashes interpreted ``array_min(transform(...))`` higher-order
    terms — the HOF form executed num_hashes·|shingles| lambda steps per
    doc (~150 CPU-seconds at 61k docs x 96 hashes; the numpy form is one
    (num_hashes x |shingles|) int64 broadcast per row, ~3 CPU-seconds).
    Exact integer modular arithmetic — h < 2^31 and a <= 2·num_hashes+1,
    so a·h+b < 2^40 never overflows int64 — hence bit-identical minima to
    the expression form (pinned by test). Only call this with a
    persisted/cached array<bigint> column."""
    import numpy as np
    from pyspark.sql.types import ArrayType, LongType

    A = np.array([_perm(i)[0] for i in range(num_hashes)], dtype=np.int64)[:, None]
    B = np.array([_perm(i)[1] for i in range(num_hashes)], dtype=np.int64)[:, None]

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(shingles: pd.Series) -> pd.Series:
        out = []
        for hs in shingles:
            if hs is None or len(hs) == 0:
                # mirror the expression form: array_min over an empty (or
                # null) transform is null per hash → an array of nulls
                out.append([None] * num_hashes)
                continue
            h = np.asarray(hs, dtype=np.int64) % _PRIME
            out.append((A * h[None, :] + B).__mod__(_PRIME).min(axis=1).tolist())
        return pd.Series(out, dtype=object)

    return sh.select("id", _sig("sh").alias("sig"))


def _lsh_candidates(
    sigs: DataFrame, num_hashes: int, bands: int, max_bucket: int = 1000
) -> DataFrame:
    """Distinct candidate id pairs (id < rid) sharing ≥1 LSH band.

    ONE pass over the signatures: explode band keys → groupBy(band_key)
    collecting the (sorted) member ids → enumerate in-bucket combinations
    with a higher-order function. A self-join formulation would recompute
    the whole signature subtree for its second side (Catalyst only reuses
    byte-identical exchanges) and would carry both join sides through a
    shuffle; here each doc id crosses the wire once per band. Buckets larger
    than ``max_bucket`` are dropped — a degenerate band key (e.g. the empty
    signature of boilerplate) would otherwise create an O(k²) pair bucket;
    real near-dup buckets are tiny."""
    if bands < 1 or num_hashes % bands != 0:
        # bands > num_hashes would make rows == 0: every band key becomes
        # the constant hash of an EMPTY slice, the max_bucket cap drops the
        # one giant bucket, and the function silently reports zero
        # duplicates; a non-divisor bands would silently ignore the tail
        # hashes of every signature
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes} "
            "(rows-per-band = num_hashes / bands must be a positive integer)"
        )
    rows = num_hashes // bands
    band_cols = [
        F.xxhash64(F.lit(b), F.slice("sig", b * rows + 1, rows)).alias("band_key")
        for b in range(bands)
    ]
    banded = sigs.select("id", F.explode(F.array(*band_cols)).alias("band_key"))
    return _pairs_from_buckets(banded, "band_key", max_bucket)


def _spread(df: DataFrame) -> DataFrame:
    """Widen a too-narrow scan before the CPU-heavy shingle/signature
    stages: shingling+hashing costs ~50 expression evaluations per input
    row, decided AFTER the scan split, so a small input (few parquet row
    groups) would pin the whole dedup pipeline to a handful of cores. No-op
    when the input is big enough to split widely on its own (the 100 TB
    case).

    The gate is the PHYSICAL partition count (``.rdd.getNumPartitions()`` —
    planning only, no job, no data touched): Catalyst's size estimate is
    directionless here — a small estimate can still be pre-split wide
    (repartitioning it again is a needless shuffle), and a large estimate
    can sit in ONE partition (a non-splittable gzip/single-row-group file)
    that must be widened or the whole pipeline pins to one core. Only the
    partition count answers the actual question."""
    spark = df.sparkSession
    want = spark.sparkContext.defaultParallelism
    try:
        if df.rdd.getNumPartitions() >= want:
            return df  # already well-split: don't shuffle the corpus text
    except Exception:
        pass  # planning unavailable: fall through to the safe widen
    return df.repartition(want)


def _pairs_from_buckets(
    member_df: DataFrame, bucket_col: str, max_bucket: "int | None"
) -> DataFrame:
    """(id, bucket) membership rows → distinct candidate pairs (id < rid)
    within each bucket, buckets capped at ``max_bucket`` members
    (``None`` = uncapped: every co-bucketed pair is a candidate).

    Two-stage explode keeps per-row memory O(bucket), not O(bucket²): a
    single flatten-of-all-combinations materializes C(n,2) structs as ONE
    array before its explode — a 7.7k-member bucket is a ~240 MB humongous
    allocation per task (measured OOM at 48 GB heap on a hot-bucket corpus).
    Here each (anchor, tail-slice) row carries at most one bucket's ids.

    Round 6: the bucket aggregation is two-phase — a codegen'd COUNT
    aggregate finds the 2..max_bucket keys first, then a broadcast
    semi-join restricts the (non-codegen ObjectHashAggregate) collect_list
    to those buckets. Most buckets are singletons (unique band keys /
    rare shingles), so the heavyweight aggregate runs over a fraction of
    the membership rows (measured 1.5x on the sf1.0 band table,
    pair set identical). ``member_df`` is consumed twice and persisted
    here (the established within-operator pattern; for the LSH callers it
    also spares recomputing the bucketing expressions for the second
    pass)."""
    member_df = member_df.persist()
    n = F.col("count")
    keep = n >= 2
    if max_bucket is not None:
        keep = keep & (n <= max_bucket)
    hot_keys = member_df.groupBy(bucket_col).count().filter(keep).select(bucket_col)
    buckets = (
        member_df.join(F.broadcast(hot_keys), bucket_col)
        .groupBy(bucket_col)
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
    )
    anchored = buckets.select(F.col("ids"), F.posexplode("ids").alias("i", "id"))
    return (
        anchored.select(
            "id",
            F.explode(F.slice("ids", F.col("i") + F.lit(2), F.size("ids"))).alias("rid"),
        )
        .dropDuplicates(["id", "rid"])
    )


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

    shingle → signature (narrow) → explode band keys → ids-only self-join per
    bucket → re-attach signatures to the candidate set → verify with
    signature agreement ≥ threshold (estimator of Jaccard).
    Output: id_a < id_b, est_jaccard.
    """
    sigs = minhash_signatures_df(df, text_col, id_col, num_hashes, shingle_n).persist()
    cands = _lsh_candidates(sigs, num_hashes, bands)
    a = sigs.select(F.col("id").alias("__ia"), F.col("sig").alias("sig"))
    b = sigs.select(F.col("id").alias("__ib"), F.col("sig").alias("rsig"))
    withsig = (
        cands.join(a, F.col("id") == F.col("__ia"))
        .join(b, F.col("rid") == F.col("__ib"))
        .select("id", "rid", "sig", "rsig")
    )
    agree = F.size(
        F.filter(F.zip_with("sig", "rsig", lambda x, y: x == y), lambda x: x)
    ) / F.lit(float(num_hashes))
    return (
        withsig.withColumn("est_jaccard", agree)
        .filter(F.col("est_jaccard") >= threshold)
        .select(F.col("id").alias("id_a"), F.col("rid").alias("id_b"), "est_jaccard")
    )


def _exact_jaccard_on_pairs(cands: DataFrame, sh: DataFrame) -> DataFrame:
    """Attach exact Jaccard (over full distinct-shingle sets) to candidate id
    pairs. The candidate set is small (post-LSH / post-df-cap), so the two
    id-joins move only candidate rows + their shingle arrays."""
    a = sh.select(F.col("id").alias("__ia"), F.col("sh").alias("sa"))
    b = sh.select(F.col("id").alias("__ib"), F.col("sh").alias("sb"))
    common = F.size(F.array_intersect("sa", "sb"))
    return (
        cands.join(a, F.col("id") == F.col("__ia"))
        .join(b, F.col("rid") == F.col("__ib"))
        .withColumn("common", common)
        .select(
            F.col("id").alias("id_a"),
            F.col("rid").alias("id_b"),
            (
                F.col("common")
                / (F.size("sa") + F.size("sb") - F.col("common"))
            ).alias("jaccard"),
        )
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 32,
    shingle_n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Production dedup shape: MinHash-LSH candidate generation + EXACT
    Jaccard verification of the candidate pairs (full shingle sets).

    Unlike ``minhash_lsh_pairs`` (signature-agreement estimator), the output
    values are exact, so the DuckDB oracle (exact Jaccard over all pairs)
    reproduces them bit-for-bit whenever LSH recall is 1.0 at the threshold —
    the driver's hash-match doubles as a recall proof. bands=32/rows=2 gives
    miss probability (1-j^2)^32 ≈ 1e-4 at j=0.5, ~0 above.
    Output: id_a < id_b, jaccard (double).

    The shingle table feeds BOTH the signature aggregation and the
    verification join; it is cached once (persist — lineage kept, so an
    executor loss recomputes the lost blocks instead of failing the job)
    rather than recomputed per consumer — at 100 TB this is the standard
    materialize-the-signature-table step of a dedup pipeline."""
    sh = shingle_df(_spread(df), text_col, id_col, shingle_n).persist()
    sigs = _signatures_from_hashed_arrays(sh, num_hashes)
    cands = _lsh_candidates(sigs, num_hashes, bands)
    return _exact_jaccard_on_pairs(cands, sh).filter(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    threshold: float = 0.5,
    max_df: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index candidates.

    Shingles with document frequency > ``max_df`` are excluded from the
    inverted index (a shingle shared by k docs makes a k^2-row bucket; hot
    boilerplate shingles carry ~no Jaccard signal) — candidates are pairs
    sharing ≥1 *indexable* shingle; Jaccard is then computed EXACTLY on the
    full shingle sets of the candidates (materialized once, see
    minhash_dedup_pairs). Output: id_a < id_b, jaccard."""
    sh = shingle_df(_spread(df), text_col, id_col, shingle_n).persist()
    inv = sh.select("id", F.explode("sh").alias("g"))
    # df cap ≡ bucket-size cap: a shingle's inverted-index bucket has one
    # entry per containing doc, so dropping buckets > max_df IS the
    # document-frequency filter — fused into candidate generation
    cands = _pairs_from_buckets(inv, "g", max_df)
    return _exact_jaccard_on_pairs(cands, sh).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def _token_hash(w, portable: bool):
    """Per-token 64-bit hash. ``portable=True`` uses a 60-bit md5-derived
    value computable identically in DuckDB
    (CAST('0x' || substr(md5(w),1,15) AS UBIGINT)) so the simhash pair set
    has a full SQL oracle; default xxhash64 is the faster scale path."""
    if portable:
        return F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long")
    return F.xxhash64(w)


def simhash64(text_col, portable: bool = False):
    """64-bit (60-bit when portable) SimHash of word tokens, fully JVM-side:
    per-bit weighted majority computed with higher-order functions over token
    hashes."""
    n_bits = 60 if portable else 64
    tokens = F.filter(F.split(F.lower(text_col), r"\s+"), lambda w: w != "")
    hashes = F.transform(tokens, lambda w: _token_hash(w, portable))

    # the python shiftright/shiftleft wrappers require literal bit counts;
    # call the SQL functions directly so the bit index can be the HOF variable
    def _sr(h, b):
        return F.call_function("shiftright", h, b)

    def _sl_one(b):
        return F.call_function("shiftleft", F.lit(1).cast("long"), b)

    # for each bit, sum(+1/-1) over tokens; set bit if sum > 0
    bit_expr = F.transform(
        F.sequence(F.lit(0), F.lit(n_bits - 1)),
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


def simhash_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """(id, sh) simhash fingerprints via explode + per-bit partial-aggregate
    sums: each token is hashed exactly ONCE (the pure-Column ``simhash64``
    re-evaluates the token-hash subtree once per bit — Catalyst does not CSE
    across higher-order functions; measured 3.4x slower even with cheap
    xxhash64, far worse with portable md5). One map-side-combined shuffle,
    n_bits sum buffers per doc. Zero-token docs drop out (their simhash
    would be the constant 0, pairing all empty docs together)."""
    import functools

    n_bits = 60 if portable else 64
    tokens = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
    tok = df.select(F.col(id_col).alias("id"), F.explode(tokens).alias("w")).select(
        "id", _token_hash(F.col("w"), portable).alias("h")
    )
    aggs = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(n_bits)
    ]
    per = tok.groupBy("id").agg(*aggs)
    one = F.lit(1).cast("long")
    bits = [
        F.when(
            F.col(f"s{b}") > 0, F.call_function("shiftleft", one, F.lit(b))
        ).otherwise(F.lit(0).cast("long"))
        for b in range(n_bits)
    ]
    return per.select("id", functools.reduce(lambda a, b: a.bitwiseOR(b), bits).alias("sh"))


def _block_layout(n_bits: int, n_blocks: int) -> "list[tuple[int, int]]":
    """(shift, width) per block, widths as equal as possible, covering
    n_bits exactly."""
    base_w, extra = divmod(n_bits, n_blocks)
    out, shift = [], 0
    for i in range(n_blocks):
        w = base_w + (1 if i < extra else 0)
        out.append((shift, w))
        shift += w
    return out


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    portable: bool = False,
    max_bucket: "int | None" = None,
    n_blocks: "int | None" = None,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming (exact output —
    the candidate stage is recall-lossless). Output: id_a < id_b, hamming.

    Candidate keys are BLOCK COMBINATIONS (the Manku/Jain/Sarma web-dedup
    scheme): the fingerprint splits into ``n_blocks`` blocks (default
    ``max_hamming + 3``) and each doc emits one key per
    C(n_blocks, n_blocks - max_hamming) combination of (n_blocks - d)
    blocks. Pigeonhole: d flipped bits hit ≤ d blocks, so ≥ n_blocks - d
    blocks agree and at least one combination key matches — recall stays
    exact. The point vs the minimal d+1-chunk split (n_blocks=d+1: 16-bit
    keys at 64 bits, 15-bit in portable-60 mode): combination keys carry
    ~(n_blocks-d)/n_blocks of the fingerprint (~32/30 bits here), so RANDOM
    collisions — which grow as n²/2^key_bits and made the minimal split
    super-linear beyond ~500k docs — shrink by ~2^16, at the price of 20
    membership rows per doc instead of 4. That is the right trade at
    100 TB: membership is linear, collisions are quadratic.

    Candidates use the same ids-only bucket machinery as the minhash/ngram
    family (``_pairs_from_buckets``): membership rows carry (id, 8-byte
    key), distinct pairs are enumerated inside each bucket, and the two
    fingerprints are re-attached ONCE per surviving pair (the earlier chunk
    self-join shipped both fingerprints through a duplicated join —
    measured 783 s on a 500k-doc stress corpus).

    ``max_bucket`` is OFF by default: a pair with exactly n_blocks - d
    agreeing blocks matches exactly ONE combination key, and dropping that
    bucket would lose the pair — unlike the minhash df-cap, there is no
    second chance. Set it only as an explicit precision/cost trade."""
    from itertools import combinations

    n_bits = 60 if portable else 64
    d = max_hamming
    blocks = n_blocks if n_blocks is not None else d + 3
    if blocks < d + 1:
        raise ValueError(f"n_blocks must be >= max_hamming + 1, got {blocks}")
    layout = _block_layout(n_bits, blocks)
    combos = list(combinations(range(blocks), blocks - d))
    # cached once (lineage kept): feeds both candidate generation and the
    # fingerprint re-attach joins
    base = simhash_df(df, text_col, id_col, portable).persist()

    def _combo_key(ci: int, combo: "tuple[int, ...]"):
        # one 8-byte key per combination: xxhash64 of (combination index,
        # block values). Equal block tuples always hash equal → recall is
        # unaffected; a 2^-64 hash collision only adds a false CANDIDATE,
        # which the exact hamming verify discards. Hashing (vs arithmetic
        # packing) also sidesteps ANSI-mode long overflow for wide combos.
        vals = [F.lit(ci)]
        for b in combo:
            shift, w = layout[b]
            # w == 64 (n_blocks=1 with max_hamming=0): the all-ones mask
            # is -1 as a signed long — (1 << 64) - 1 would not fit
            mask = (1 << w) - 1 if w < 64 else -1
            vals.append(F.shiftright("sh", shift).bitwiseAND(F.lit(mask)))
        return F.xxhash64(*vals)

    member = base.select(
        "id",
        F.explode(
            F.array(*[_combo_key(ci, c) for ci, c in enumerate(combos)])
        ).alias("bucket"),
    )
    cands = _pairs_from_buckets(member, "bucket", max_bucket)
    a = base.select(F.col("id").alias("__ia"), F.col("sh").alias("sa"))
    b = base.select(F.col("id").alias("__ib"), F.col("sh").alias("sb"))
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cands.join(a, F.col("id") == F.col("__ia"))
        .join(b, F.col("rid") == F.col("__ib"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("id").alias("id_a"), F.col("rid").alias("id_b"), "hamming")
    )


# ---------------------------------------------------------------------------
# near-dup clustering: connected components over duplicate pairs
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components over an undirected duplicate-pair graph:
    ``(doc_id, cluster_rep)`` for every node appearing in ``pairs``, where
    ``cluster_rep`` is the smallest id in the node's component.

    This is the keep-one-per-CLUSTER step of a production dedup pipeline:
    pairwise loser-dropping (drop the larger id of each pair) keeps a node
    whose every neighbor is larger even when its component contains a smaller
    doc elsewhere — e.g. pairs (1,3),(2,3) keep {1,2} pairwise but the
    component is {1,2,3} and only 1 should survive. Transitive chains
    (A~B~C with A≁C) are the normal output shape of threshold dedup.

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — O(log² n)
    rounds worst-case, each round two hash-aggregate shuffles over the
    CURRENT edge list (which only shrinks toward star graphs); no step ever
    materializes a transitive closure, so a path graph of length 10⁶ costs
    ~20 rounds of linear work, not a 10¹²-pair blowup. Per round the edge
    set is localCheckpoint'ed to truncate lineage (at 100 TB use
    ``sparkContext.setCheckpointDir`` + reliable ``checkpoint()`` instead —
    same plan, executor-loss-safe).

      large-star: every node links its LARGER neighbors to the component-min
                  seen so far;  small-star: every node and its SMALLER
                  neighbors link to their min. Fixpoint = every edge is
                  (node -> component min).

    Termination check is (count, xor-of-pair-hashes) equality — one cheap
    aggregate per round, no exceptAll join.
    """
    spark = pairs.sparkSession
    u, v = F.col("u"), F.col("v")
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(u != v)
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _signature(e: DataFrame):
        # bit_xor, not sum: order-independent over the distinct edge set and
        # cannot overflow under ANSI mode
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(F.least(u, v), F.greatest(u, v))).alias("h"),
        ).first()
        return row["n"], row["h"]

    def _large_star(e: DataFrame) -> DataFrame:
        sym = e.union(e.select(v.alias("u"), u.alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("__mv"))
            .select("u", F.least("__mv", F.col("u")).alias("m"))
        )
        return (
            sym.join(mins, "u")
            .filter(v > u)
            .select(v.alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        dirn = e.select(F.greatest(u, v).alias("u"), F.least(u, v).alias("v"))
        mins = dirn.groupBy("u").agg(F.min("v").alias("m"))
        linked = dirn.join(mins, "u")
        out = linked.select(
            F.explode(F.array(F.col("v"), F.col("u"))).alias("u"),
            F.col("m").alias("v"),
        )
        return out.filter(F.col("u") != F.col("v")).distinct()

    sig = _signature(edges)
    par = spark.sparkContext.defaultParallelism
    for _ in range(max_iterations):
        nxt = _small_star(_large_star(edges))
        # adapt the checkpointed edge list's partitioning to its (known,
        # shrinking) size: a near-converged graph of a few hundred edges
        # otherwise schedules 32+ map tasks per round stage, and the round
        # latency is pure task overhead. coalesce is narrow (no shuffle);
        # skipped entirely when the edge count justifies full parallelism,
        # so cluster-scale graphs keep their natural partitioning.
        parts = sig[0] // 500_000 + 1
        if parts < par:
            nxt = nxt.coalesce(parts)
        nxt = nxt.localCheckpoint(eager=True)
        nsig = _signature(nxt)
        edges, prev_sig, sig = nxt, sig, nsig
        if nsig == prev_sig:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )

    # fixpoint edges are (node -> component min); roots map to themselves
    members = edges.select(u.alias("doc_id"), v.alias("cluster_rep"))
    roots = edges.select(v.alias("doc_id")).distinct().withColumn(
        "cluster_rep", F.col("doc_id")
    )
    return members.union(roots)


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """``(doc_id, cluster_rep, cluster_size)`` for every doc in a duplicate
    cluster (components of the pair graph; singleton docs never appear in
    ``pairs`` and are their own implicit cluster). Survivor selection is
    ``cluster_rep`` (smallest id — deterministic, replay-stable); dropping
    ``doc_id != cluster_rep`` keeps exactly one doc per cluster."""
    comp = connected_components(pairs, id_a, id_b)
    sizes = comp.groupBy("cluster_rep").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comp.join(sizes, "cluster_rep").select(
        "doc_id", "cluster_rep", "cluster_size"
    )
