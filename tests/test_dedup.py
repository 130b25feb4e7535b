"""Dedup suite: exact, minhash-LSH, simhash, embedding near-dup, plus the
text-analysis functions they build on."""

from pyspark.sql import functions as F

from azure_blob_crawler_spark.functions import text as TXT
from azure_blob_crawler_spark.operators import dedup as DD


def docs_df(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base + " extra tail words appended here"),  # near dup of 1
        (4, "completely different content about spark shuffle partitions merge"),
        (5, "THE  QUICK   brown fox jumps over the lazy dog again and again today"),  # ws/case dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    out = DD.exact_dedup(docs_df(spark), "text", "doc_id")
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 3, 4]  # 2 and 5 collapse onto 1


def test_minhash_signature_properties(spark):
    sigs = {r["id"]: r["sig"] for r in DD.minhash_signatures(docs_df(spark), "text", "doc_id").collect()}
    assert sigs[1] == sigs[2]  # identical text, identical signature
    agree = sum(a == b for a, b in zip(sigs[1], sigs[3])) / len(sigs[1])
    assert agree > 0.3  # near dup shares most minhashes
    agree_far = sum(a == b for a, b in zip(sigs[1], sigs[4])) / len(sigs[1])
    assert agree_far < 0.2


def test_minhash_lsh_pairs_and_dedup(spark):
    df = docs_df(spark)
    sigs = DD.minhash_signatures(df, "text", "doc_id")
    pairs = {(r["id_a"], r["id_b"]) for r in DD.minhash_lsh_pairs(sigs, verify_threshold=0.4).collect()}
    assert (1, 2) in pairs
    assert (1, 3) in pairs or (2, 3) in pairs
    assert not any(4 in p for p in pairs)
    kept = sorted(r["doc_id"] for r in DD.minhash_dedup(df, "text", "doc_id", threshold=0.4).collect())
    assert 1 in kept and 4 in kept and 2 not in kept


def test_simhash_hamming(spark):
    sigs = DD.simhash_signatures(docs_df(spark), "text", "doc_id")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in DD.simhash_pairs(sigs, max_hamming=10).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 4) not in pairs


def test_ngram_jaccard(spark):
    df = docs_df(spark)
    a = df.filter("doc_id = 1").select(F.col("text").alias("ta"))
    b = df.filter("doc_id = 3").select(F.col("text").alias("tb"))
    j = a.crossJoin(b).select(DD.ngram_jaccard(F.col("ta"), F.col("tb"), 3).alias("j")).collect()[0]["j"]
    assert 0.3 < j < 1.0
    j_self = a.crossJoin(a.select(F.col("ta").alias("tb"))).select(
        DD.ngram_jaccard(F.col("ta"), F.col("tb"), 3).alias("j")
    ).collect()[0]["j"]
    assert j_self == 1.0


def test_embedding_near_dups_recovers_planted(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.standard_normal(64)]) for i in range(50)]
    rows += [(1000 + i, rows[i][1]) for i in range(10)]  # planted exact dups
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["id_a"], r["id_b"]) for r in DD.embedding_near_dups(emb, threshold=0.99).collect()}
    assert {(i, 1000 + i) for i in range(10)} <= pairs


def test_text_functions(spark):
    df = spark.createDataFrame(
        [("The cat and the dog sat. It was good! Was it?",)], ["text"]
    )
    row = df.select(
        TXT.token_count(F.col("text")).alias("tok"),
        TXT.word_count(F.col("text")).alias("w"),
        TXT.sentence_count(F.col("text")).alias("s"),
        TXT.lang_id(F.col("text")).alias("lang"),
        TXT.fingerprint(F.col("text")).alias("fp"),
    ).collect()[0]
    assert row["w"] == 11
    assert row["s"] == 3
    assert row["tok"] == 14  # 11 words + 3 terminators
    assert row["lang"] == "en"
    # fingerprint is ws/case-insensitive
    df2 = spark.createDataFrame([("the CAT and  the dog sat.  it was good! was IT?",)], ["text"])
    fp2 = df2.select(TXT.fingerprint(F.col("text")).alias("fp")).collect()[0]["fp"]
    assert fp2 == row["fp"]
