"""Document deduplication operators (training-data pipeline).

Four escalating strategies, all Spark-first:

* ``exact_dedup``          — hash-groupBy on a canonical fingerprint.
* ``ngram_jaccard_pairs``  — exact n-gram Jaccard via shingle
  explode + self-join (the precise but shuffle-heavy baseline).
* ``minhash_lsh_pairs``    — MinHash signatures computed per-row with
  array expressions (NO shuffle for the signature), LSH banding, and
  a bucket join that only compares candidates; the 100 TB path.
* ``simhash``              — 16/32-bit SimHash computed with
  aggregate/zip_with array folds, bucket by hash for near-dup
  clustering.

Scale notes: minhash signatures are per-row narrow ops (pipelined,
codegen); the only shuffle is the band-bucket join whose size is the
candidate-pair count, not O(n^2).  Exact jaccard verification runs
only on candidates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_cms_spark.functions.text import fingerprint, tokens, word_shingles


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of byte-identical (post-normalization) docs: keeper =
    min id per fingerprint; returns (fingerprint, keeper_id, dup_count)
    for groups with >1 member."""
    return (
        df.groupBy(fingerprint(F.col(text_col)).alias("fp"))
        .agg(
            F.min(F.col(id_col)).alias("keeper_id"),
            F.count("*").alias("dup_count"),
        )
        .where(F.col("dup_count") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity for all pairs sharing at
    least one shingle.  Output: (id_a, id_b, jaccard), id_a < id_b.

    The shingle self-join bounds comparisons to pairs with overlap;
    still O(sum of shingle-bucket^2) — use minhash_lsh_pairs beyond
    ~10^6 docs."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(word_shingles(F.col(text_col), n)).alias("_sh"),
    ).withColumn("_size", F.size("_sh"))
    exploded = sh.select("_id", "_size", F.explode("_sh").alias("_s"))
    a = exploded.select(
        F.col("_id").alias("id_a"), F.col("_size").alias("size_a"), "_s"
    )
    b = exploded.select(
        F.col("_id").alias("id_b"), F.col("_size").alias("size_b"), "_s"
    )
    inter = (
        a.join(b, "_s")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count("*").alias("_inter"))
    )
    jac = inter.withColumn(
        "jaccard",
        F.round(
            F.col("_inter") / (F.col("size_a") + F.col("size_b") - F.col("_inter")), 4
        ),
    )
    return jac.where(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def minhash_signature(text: Column, n_hashes: int = 16, shingle_n: int = 3) -> Column:
    """MinHash signature as array<bigint> from array expressions over
    the row's own shingles.  Zero shuffle, but note: Catalyst does NOT
    share the shingle subexpression across the n_hashes transforms, so
    the shingle array is rebuilt n_hashes times per row — fine for
    one-off column use; the batch path ``minhash_signatures`` (explode
    + partial-agg) is ~10x cheaper per doc."""
    sh = F.array_distinct(word_shingles(text, shingle_n))
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda seed: F.coalesce(
            F.array_min(F.transform(sh, lambda s: F.xxhash64(s, seed))),
            F.lit(0).cast("long"),
        ),
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig array<bigint>) for every doc: explode shingles once,
    hash each shingle n_hashes times, take per-doc minima.  The hash
    aggregation is map-side partial, so the shuffle carries only
    n_hashes longs per doc regardless of corpus size.  Docs with no
    shingles (< shingle_n tokens) get an all-zero signature."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode_outer(F.array_distinct(word_shingles(F.col(text_col), shingle_n))).alias("_s"),
    )
    aggs = [
        F.coalesce(F.min(F.xxhash64(F.col("_s"), F.lit(seed))), F.lit(0).cast("long")).alias(f"_h{seed}")
        for seed in range(n_hashes)
    ]
    return sh.groupBy("_id").agg(*aggs).select(
        "_id", F.array(*[F.col(f"_h{s}") for s in range(n_hashes)]).alias("_sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    verify_threshold: float | None = 0.8,
) -> DataFrame:
    """MinHash + LSH banding near-dup candidates.

    n_hashes/bands rows-per-band tune the S-curve; candidates are
    pairs agreeing on >=1 band.  With ``verify_threshold`` set, exact
    Jaccard is computed on candidates only (shingle intersection via
    array ops on the joined rows — no second explode)."""
    rows_per_band = n_hashes // bands
    base = minhash_signatures(df, text_col, id_col, n_hashes, shingle_n)
    # the band join shuffles ONLY (id, band, bhash) — 24 bytes/row;
    # shingle arrays are re-attached to the (far smaller) deduped
    # candidate set afterwards.  At 10^8 docs this is the difference
    # between shuffling ids and shuffling the corpus.
    banded = base.select(
        "_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at(F.col("_sig"), b * rows_per_band + j + 1).cast("string")
                            for j in range(rows_per_band)
                        ],
                    ),
                    b,
                ),
            )
        ).alias("_band", "_bhash"),
    )
    a = banded.select(F.col("_id").alias("id_a"), "_band", "_bhash")
    b = banded.select(F.col("_id").alias("id_b"), "_band", "_bhash")
    cand = (
        a.join(b, ["_band", "_bhash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    shingle_sets = df.select(
        F.col(id_col).alias("_sid"),
        F.array_distinct(word_shingles(F.col(text_col), shingle_n)).alias("_sh"),
    )
    withsh = cand.join(
        shingle_sets.select(F.col("_sid").alias("id_a"), F.col("_sh").alias("sh_a")), "id_a"
    ).join(
        shingle_sets.select(F.col("_sid").alias("id_b"), F.col("_sh").alias("sh_b")), "id_b"
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    out = withsh.withColumn(
        "jaccard", F.round(inter / F.greatest(union, F.lit(1)), 4)
    ).select("id_a", "id_b", "jaccard")
    if verify_threshold is not None:
        out = out.where(F.col("jaccard") >= verify_threshold)
    return out


POLY_MOD = 2_147_483_647
POLY_BASE = 257


def poly_hash(s: Column, mod: int = POLY_MOD, base: int = POLY_BASE) -> Column:
    """Exact polynomial string hash over char codes — deliberately
    NOT xxhash64: both Spark and DuckDB compute this digit-for-digit
    (DuckDB: list_reduce over ord(substring(...))), which is what lets
    the portable MinHash below be oracle-checked end to end."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(s)), lambda i: F.ascii(F.substring(s, i, 1))
    )
    h = F.aggregate(
        chars, F.lit(0).cast("long"), lambda acc, c: (acc * base + c) % mod
    )
    return F.when(F.length(s) > 0, h).otherwise(F.lit(0).cast("long"))


def _mh_coeffs(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) for the universal-hash family
    h_i(x) = (a_i * x + b_i) mod p."""
    return [(2 * i + 1, 97 * i + 13) for i in range(n_hashes)]


def minhash_signatures_portable(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 16,
    shingle_n: int = 3,
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Like ``minhash_signatures`` but with the portable polynomial
    hash family — same explode + map-side partial-agg shape (shuffle
    carries n_hashes longs per doc), oracle-replayable in DuckDB.
    ``extra_cols`` ride the groupBy key (e.g. a change version when a
    CDC batch holds several versions of the same doc id)."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        *extra_cols,
        F.explode_outer(F.array_distinct(word_shingles(F.col(text_col), shingle_n))).alias("_s"),
    ).withColumn("_h", poly_hash(F.col("_s")))
    aggs = [
        F.coalesce(
            F.min((F.lit(a) * F.col("_h") + F.lit(b)) % POLY_MOD),
            F.lit(0).cast("long"),
        ).alias(f"_m{i}")
        for i, (a, b) in enumerate(_mh_coeffs(n_hashes))
    ]
    return sh.groupBy("_id", *extra_cols).agg(*aggs)


def minhash_lsh_pairs_portable(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    verify_threshold: float = 0.8,
) -> DataFrame:
    """MinHash + LSH banding with the PORTABLE hash family: the full
    pipeline — signatures, band agreement, exact-jaccard verification —
    is deterministic arithmetic DuckDB can replay, so the LSH path
    itself gets an oracle-green correctness row (``minhash_lsh_portable``)
    instead of a rows-only check.  Same shuffle shape as
    ``minhash_lsh_pairs``: the band join carries (id, band, band key).
    """
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures_portable(df, text_col, id_col, n_hashes, shingle_n)
    banded = sigs.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"_m{b * rows_per_band + j}").cast("string")
                            for j in range(rows_per_band)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band", "_bkey"),
    )
    a = banded.select(F.col("_id").alias("id_a"), "_band", "_bkey")
    b = banded.select(F.col("_id").alias("id_b"), "_band", "_bkey")
    cand = (
        a.join(b, ["_band", "_bkey"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    shingle_sets = df.select(
        F.col(id_col).alias("_sid"),
        F.array_distinct(word_shingles(F.col(text_col), shingle_n)).alias("_sh"),
    )
    withsh = cand.join(
        shingle_sets.select(F.col("_sid").alias("id_a"), F.col("_sh").alias("sh_a")), "id_a"
    ).join(
        shingle_sets.select(F.col("_sid").alias("id_b"), F.col("_sh").alias("sh_b")), "id_b"
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    out = withsh.withColumn(
        "jaccard", F.round(inter / F.greatest(union, F.lit(1)), 4)
    ).select("id_a", "id_b", "jaccard")
    return out.where(F.col("jaccard") >= verify_threshold)


def simhash(text: Column, bits: int = 16) -> Column:
    """SimHash over whitespace tokens: per bit j, sign of the sum of
    (+1/-1) votes from xxhash64(token, j).  Pure array fold."""
    toks = tokens(F.lower(text))
    votes = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, t: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda j: F.when(F.pmod(F.xxhash64(t, j), 2) == 1, F.lit(1)).otherwise(
                    F.lit(-1)
                ).cast("long"),
            ),
            lambda x, y: x + y,
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            # 2^j via double pow (exact for j < 53); shiftleft needs a
            # literal shift amount so it can't take the lambda index.
            lambda v, j: F.when(v > 0, F.pow(F.lit(2.0), j).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def simhash_portable(text: Column, bits: int = 16) -> Column:
    """SimHash with the PORTABLE polynomial hash family: one
    ``poly_hash`` per token, then the vote for bit j is the parity of
    the same universal family h_j(x) = (a_j·x + b_j) mod p used by
    ``minhash_signatures_portable`` — every step is integer/double
    arithmetic DuckDB replays digit-for-digit (the xxhash64 ``simhash``
    above stays Spark-only).  Same single-pass array-fold shape."""
    toks = tokens(F.lower(text))
    phs = F.transform(toks, lambda t: poly_hash(t))
    coeffs = _mh_coeffs(bits)
    votes = F.aggregate(
        phs,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.pmod(F.lit(a) * h + F.lit(b), F.lit(POLY_MOD)) % 2 == 1,
                        F.lit(1),
                    )
                    .otherwise(F.lit(-1))
                    .cast("long")
                    for (a, b) in coeffs
                ]
            ),
            lambda x, y: x + y,
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda v, j: F.when(v > 0, F.pow(F.lit(2.0), j).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 32,
    max_hamming: int = 3,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs within a Hamming-distance budget of the SimHash.

    Pigeonhole banding: split the ``bits``-bit hash into
    ``max_hamming + 1`` contiguous bands — two hashes within
    ``max_hamming`` differing bits MUST agree exactly on at least one
    band, so the band join has 100% recall at the budget (not
    probabilistic like MinHash).  Shuffle carries (id, band, band
    value); candidates are verified with bit_count(XOR) — exact
    precision.  Output: (id_a, id_b, hamming), id_a < id_b.

    ``bits`` <= 53: the per-bit weights are built with double pow
    (exact only below 2^53 — shiftleft can't take a lambda index).
    """
    assert bits <= 53, "simhash bits capped at 53 (double-pow exactness)"
    n_bands = max_hamming + 1
    hash_fn = simhash_portable if portable else simhash
    base = df.select(
        F.col(id_col).alias("_id"), hash_fn(F.col(text_col), bits).alias("_h")
    )
    # band value = the band's bit slice (shift + mask with literals).
    bounds = [round(i * bits / n_bands) for i in range(n_bands + 1)]
    banded = base.select(
        "_id",
        "_h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("_band"),
                        (
                            F.shiftright(F.col("_h"), bounds[i])
                            % F.lit(2 ** (bounds[i + 1] - bounds[i]))
                        ).alias("_bval"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("_b"),
    ).select("_id", "_h", F.col("_b._band").alias("_band"), F.col("_b._bval").alias("_bval"))
    a = banded.select(F.col("_id").alias("id_a"), F.col("_h").alias("h_a"), "_band", "_bval")
    b = banded.select(F.col("_id").alias("id_b"), F.col("_h").alias("h_b"), "_band", "_bval")
    cand = (
        a.join(b, ["_band", "_bval"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    out = cand.withColumn(
        "hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    ).where(F.col("hamming") <= max_hamming)
    return out.select("id_a", "id_b", "hamming")


def simhash_clusters(df: DataFrame, text_col: str, id_col: str, bits: int = 16) -> DataFrame:
    """Docs sharing an identical SimHash — cheap near-dup clusters."""
    return (
        df.select(F.col(id_col).alias("_id"), simhash(F.col(text_col), bits).alias("simhash"))
        .groupBy("simhash")
        .agg(F.min("_id").alias("keeper_id"), F.count("*").alias("cluster_size"))
        .where(F.col("cluster_size") > 1)
    )
