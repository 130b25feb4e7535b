"""Deduplication suite for training-data pipelines (engine-side additions —
the reference has no dedup; its at-least-once queue makes duplicates an
accepted hazard, SURVEY.md §2.12).

- exact_dedup          — hash-groupBy on a content fingerprint (one shuffle)
- minhash_signatures / minhash_lsh_pairs / minhash_dedup
                       — shingle → minhash → band-bucket join → verified
                         Jaccard. FULLY Catalyst-native: shingling via
                         transform/sequence, minhash via array_min over
                         xxhash64(seed, shingle). No Python in the plan.
- simhash_signatures / simhash_pairs
                       — 64-bit simhash (numpy pandas UDF), Hamming
                         candidates via 4×16-bit band blocking
- embedding_near_dups  — cosine near-dup via random-hyperplane LSH buckets
                         + in-bucket verification

Scale shape: every candidate generator is a bucket-equi-join (shuffle on
band hash), never an O(n²) cross join; verification only touches bucket
cohabitants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from azure_blob_crawler_spark.functions.text import TOKEN_PATTERN, fingerprint


# --- exact ---------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id representative of each exact-content group
    (whitespace/case-normalized md5)."""
    w = Window.partitionBy("fp").orderBy(id_col)
    return (
        df.withColumn("fp", fingerprint(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "fp")
    )


# --- minhash LSH ------------------------------------------------------------


def shingles(col, k: int = 5):
    """Word k-shingles as an array column (native: slice over a sequence)."""
    words = F.split(F.lower(F.trim(col)), r"\s+")
    n = F.size(words)
    return F.when(n < k, F.array(F.array_join(words, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.array_join(F.slice(words, i, k), " "),
        )
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n_hashes: int = 64, shingle_k: int = 5
) -> DataFrame:
    """(id, sig: array<long>[n_hashes]) — minhash over word shingles,
    all in the JVM: hash h_i(s) = xxhash64(i, s), sig[i] = min over shingles."""
    def hasher(seed: int):
        # one-arg lambda required: a two-arg lambda would be interpreted by
        # transform() as (element, index) and shadow the seed
        return lambda s: F.xxhash64(F.lit(seed), s)

    # materialize the shingle array once as a column — 64 array_min
    # expressions over one shared array, instead of 64 re-evaluations of the
    # shingling (Catalyst does not CSE across independent projections)
    with_sh = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_k).alias("__sh")
    )
    sig = F.array(
        *[F.array_min(F.transform(F.col("__sh"), hasher(i))) for i in range(n_hashes)]
    )
    return with_sh.select("id", sig.alias("sig"))


def minhash_lsh_pairs(
    sigs: DataFrame, n_bands: int = 16, n_hashes: int = 64, verify_threshold: float = 0.5
) -> DataFrame:
    """Candidate pairs via banded LSH, verified by signature-estimated
    Jaccard. Returns (id_a, id_b, est_jaccard) with id_a < id_b."""
    rows_per_band = n_hashes // n_bands
    bands = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                        ",",
                    )
                ).alias("bucket"),
            ),
        )
    )
    sigs = sigs.persist()
    # band join carries ids only — the 64-long signatures would otherwise be
    # shuffled once per band per side; they re-attach to the (much smaller)
    # deduplicated candidate set below
    banded = sigs.select("id", bands.alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq)
    ) / F.lit(float(n_hashes))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= verify_threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 64,
    n_bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Drop near-duplicates: every doc that pairs (above threshold) with a
    lower-id doc is removed (greedy union toward the minimum id)."""
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k)
    pairs = minhash_lsh_pairs(sigs, n_bands, n_hashes, threshold)
    losers = pairs.select(F.col("id_b").alias("id")).distinct()
    return df.join(losers, df[id_col] == losers["id"], "left_anti")


# --- simhash -------------------------------------------------------------------


def make_simhash_udf():
    """64-bit simhash of token stream (crc-based token hashes, numpy
    bit-vote accumulation per Arrow batch)."""
    import re
    import zlib

    tok = re.compile(TOKEN_PATTERN)

    @F.pandas_udf(LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts.fillna("")):
            toks = tok.findall(t.lower())
            if not toks:
                continue
            h1 = np.fromiter(
                (zlib.crc32(w.encode()) for w in toks), dtype=np.uint64, count=len(toks)
            )
            h2 = np.fromiter(
                (zlib.crc32(w.encode()[::-1]) for w in toks), dtype=np.uint64, count=len(toks)
            )
            h = (h1 << np.uint64(32)) | h2
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                np.int64
            )
            votes = (2 * bits - 1).sum(axis=0)
            sig = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(b)
            out[i] = sig.astype(np.int64)
        return pd.Series(out)

    return simhash


def simhash_signatures(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(F.col(id_col).alias("id"), make_simhash_udf()(F.col(text_col)).alias("sim"))


def simhash_pairs(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup candidates: by pigeonhole, hamming ≤ 3 ⇒ at least one of the
    four 16-bit blocks matches exactly — block-equality join then verify."""
    blocks = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("blk"),
                    F.shiftrightunsigned(F.col("sim"), b * 16)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias("key"),
                )
                for b in range(4)
            ]
        )
    )
    banded = sigs.select("id", "sim", blocks.alias("bb")).select(
        "id", "sim", F.col("bb.blk").alias("blk"), F.col("bb.key").alias("key")
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim")))
    return (
        a.join(b, ["blk", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), ham.alias("hamming")
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


# --- n-gram jaccard (exact, for verification/tests) ---------------------------


def ngram_jaccard(col_a, col_b, k: int = 5):
    """Exact word-shingle Jaccard between two text columns (native)."""
    sa, sb = F.array_distinct(shingles(col_a, k)), F.array_distinct(shingles(col_b, k))
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(F.array_union(sa, sb))
    return F.when(union == 0, 0.0).otherwise(inter / union)


# --- embedding near-dup ---------------------------------------------------------


def embedding_near_dups(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 16,
    dim: int = 64,
    threshold: float = 0.95,
    seed: int = 7,
) -> DataFrame:
    """Cosine near-duplicates: random-hyperplane LSH signature (numpy pandas
    UDF) buckets candidates; exact cosine verifies in-bucket pairs."""
    from azure_blob_crawler_spark.functions.vectors import cosine as cos

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float64)
    bc = emb.sparkSession.sparkContext.broadcast(planes)

    @F.pandas_udf(LongType())
    def lsh_sig(vecs: pd.Series) -> pd.Series:
        p = bc.value
        out = np.zeros(len(vecs), dtype=np.int64)
        for i, v in enumerate(vecs):
            if v is None:
                continue
            arr = np.asarray(v, dtype=np.float64)[: p.shape[0]]
            bits = (arr @ p[: len(arr)]) > 0
            out[i] = int(sum(int(b) << j for j, b in enumerate(bits)))
        return pd.Series(out)

    sig = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"), lsh_sig(F.col(vec_col)).alias("bucket"))
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(b, "bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("cos_sim", cos(F.col("a.v"), F.col("b.v")))
        .filter(F.col("cos_sim") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cos_sim")
        .dropDuplicates(["id_a", "id_b"])
    )
