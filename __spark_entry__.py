"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship document pipeline (spans → chunks →
embeddings) on sf0.001. ``queries()`` exposes one entry per implemented
operator family from SURVEY.md §2 (+ the training-data operators);
``oracle_sql()`` provides the DuckDB twin for every SQL-expressible one.

Column-name and float-rounding discipline: every computed column is aliased
identically on both sides, and every float produced by arithmetic is
round(·, 4..6) on both sides so the order-insensitive value hash matches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azure_blob_crawler_spark import config
from azure_blob_crawler_spark.functions import text as TXT
from azure_blob_crawler_spark.functions.embedding import make_embed_udf
from azure_blob_crawler_spark.functions.urls import canonical_url, canonicalize_sql
from azure_blob_crawler_spark.functions.vectors import cosine, cosine_sql
from azure_blob_crawler_spark.operators import dedup as DD
from azure_blob_crawler_spark.operators import query as Q
from azure_blob_crawler_spark.operators import similarity as SIM
from azure_blob_crawler_spark.operators.chunker import make_chunk_doc_udf
from azure_blob_crawler_spark.operators.extraction import with_extraction
from azure_blob_crawler_spark.sources.synthetic import documents_with_spans

EMBED_DIM = config.TEST_EMBEDDING_DIM  # = the testdata embeddings dim (64)


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship pipeline
# ---------------------------------------------------------------------------


def _doc_chunks(
    spark: SparkSession, sf_dir: str, max_tokens: int = 64, embed: bool = True
) -> DataFrame:
    """documents → interleaved spans → extraction → chunking → embedding.

    Small ``max_tokens`` because the synthetic docs are short; the budget
    path is what the reference exercises at 4000 (chunking.py:58-121).
    ``embed=False`` skips the embedding UDF for text-only consumers (BM25)."""
    docs = with_extraction(documents_with_spans(spark, sf_dir))
    chunker = make_chunk_doc_udf(max_tokens=max_tokens, overlap_tokens=8)
    out = (
        docs.filter(F.trim("full_content") != "")
        .select(
            "doc_id",
            F.posexplode(chunker("pages", "full_content", "use_pages")).alias(
                "chunk_index", "content"
            ),
        )
        .withColumn("chunk_id", F.concat_ws("_", "doc_id", F.lit("chunk"), "chunk_index"))
        .withColumn("n_tokens", TXT.token_count(F.col("content")))
    )
    if embed:
        out = out.withColumn("vector", make_embed_udf(EMBED_DIM)("content"))
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full document pipeline at sf0.001 + top-k hybrid query."""
    chunks = _doc_chunks(spark, "/root/testdata/sf0.001")
    return Q.run_query(
        chunks, query_text="spark merge shuffle", search_type="hybrid",
        top=25, embed_dim=EMBED_DIM,
    )


# ---------------------------------------------------------------------------
# synthetic URL column shared by the crawl-shaped oracle queries (built from
# documents.doc_id identically on both engines)
# ---------------------------------------------------------------------------

_URL_SQL = (
    "'https://Host' || cast(doc_id % 50 as varchar) || '.Example.COM:443/p/./x' "
    "|| cast(doc_id as varchar) || '/../d' || cast(doc_id as varchar) "
    "|| case when doc_id % 3 = 0 then '.txt' when doc_id % 3 = 1 then '.pdf' "
    "else '.bin' end || '#frag'"
)


def _url_col() -> F.Column:
    ext = (
        F.when(F.col("doc_id") % 3 == 0, ".txt")
        .when(F.col("doc_id") % 3 == 1, ".pdf")
        .otherwise(".bin")
    )
    return F.concat(
        F.lit("https://Host"), (F.col("doc_id") % 50).cast("string"),
        F.lit(".Example.COM:443/p/./x"), F.col("doc_id").cast("string"),
        F.lit("/../d"), F.col("doc_id").cast("string"), ext, F.lit("#frag"),
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- relational core (SURVEY.md §2.2-2.7 driver-contract ops) ---

    def q1_pricing_summary(spark, d):
        li = T(spark, d, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        return (
            li.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
                ).alias("sum_disc_price"),
                F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                F.count("*").alias("count_order"),
            )
        )

    q["q1_pricing_summary"] = q1_pricing_summary

    def q3_shipping_priority(spark, d):
        c = T(spark, d, "customer").filter(F.col("c_mktsegment") == "BUILDING")
        o = T(spark, d, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
        li = T(spark, d, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01"))
        return (
            c.join(o, c.c_custkey == o.o_custkey)
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderkey")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
                ).alias("revenue")
            )
            .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
            .limit(10)
        )

    q["q3_shipping_priority"] = q3_shipping_priority

    def q5_supplier_volume(spark, d):
        return (
            T(spark, d, "region")
            .join(T(spark, d, "nation"), F.col("n_regionkey") == F.col("r_regionkey"))
            .join(T(spark, d, "customer"), F.col("c_nationkey") == F.col("n_nationkey"))
            .join(T(spark, d, "orders"), F.col("o_custkey") == F.col("c_custkey"))
            .join(T(spark, d, "lineitem"), F.col("l_orderkey") == F.col("o_orderkey"))
            .join(
                T(spark, d, "supplier"),
                (F.col("s_suppkey") == F.col("l_suppkey"))
                & (F.col("s_nationkey") == F.col("c_nationkey")),
            )
            .groupBy("r_name", "n_name")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
                ).alias("revenue")
            )
        )

    q["q5_supplier_volume"] = q5_supplier_volume

    def q_window_rank(spark, d):
        w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        return (
            T(spark, d, "orders")
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("o_custkey", "o_orderkey", "rk")
        )

    q["q_window_rank"] = q_window_rank

    def q_events_lag(spark, d):
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ev = T(spark, d, "events").withColumn(
            "diff", F.col("value") - F.lag("value").over(w)
        )
        return ev.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("diff"), 4).alias("sum_diff"),
        )

    q["q_events_lag"] = q_events_lag

    def q_events_tumbling(spark, d):
        ev = T(spark, d, "events")
        return (
            ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("wstart"),
                "event_type", "n", "sum_value",
            )
        )

    q["q_events_tumbling"] = q_events_tumbling

    def q_rollup(spark, d):
        return (
            T(spark, d, "region")
            .join(T(spark, d, "nation"), F.col("n_regionkey") == F.col("r_regionkey"))
            .join(T(spark, d, "customer"), F.col("c_nationkey") == F.col("n_nationkey"))
            .rollup("r_name", "n_name")
            .agg(F.count("*").alias("n_cust"), F.round(F.sum("c_acctbal"), 4).alias("sum_bal"))
            .select(
                F.coalesce("r_name", F.lit("ALL")).alias("r"),
                F.coalesce("n_name", F.lit("ALL")).alias("n"),
                "n_cust", "sum_bal",
            )
        )

    q["q_rollup"] = q_rollup

    def q_setops(spark, d):
        c = T(spark, d, "customer")
        o = T(spark, d, "orders")
        building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
        with_orders = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")
        rich = c.filter(F.col("c_acctbal") >= 100).select("c_custkey")
        machinery_no_orders = (
            c.filter(F.col("c_mktsegment") == "MACHINERY")
            .join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey")
        )
        return (
            building.intersect(with_orders).exceptAll(rich).distinct().union(machinery_no_orders).distinct()
        )

    q["q_setops"] = q_setops

    def q_semi_anti_counts(spark, d):
        c, o, n = T(spark, d, "customer"), T(spark, d, "orders"), T(spark, d, "nation")
        semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        s = semi.groupBy("c_nationkey").agg(F.count("*").alias("n_with_orders")).withColumnRenamed("c_nationkey", "nk_s")
        a = anti.groupBy("c_nationkey").agg(F.count("*").alias("n_without_orders")).withColumnRenamed("c_nationkey", "nk_a")
        return (
            n.join(s, n.n_nationkey == s.nk_s, "left")
            .join(a, n.n_nationkey == a.nk_a, "left")
            .select(
                "n_name",
                F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
                F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
            )
        )

    q["q_semi_anti_counts"] = q_semi_anti_counts

    def q_topk_orders(spark, d):
        return (
            T(spark, d, "orders")
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(10)
            .select(
                "o_orderkey", "o_custkey", "o_totalprice",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            )
        )

    q["q_topk_orders"] = q_topk_orders

    def q_filter_project(spark, d):
        return (
            T(spark, d, "part")
            .filter((F.col("p_size").between(10, 30)) & (F.col("p_type") == "ECONOMY"))
            .select("p_partkey", "p_name", "p_retailprice")
        )

    q["q_filter_project"] = q_filter_project

    def q_distinct_agg(spark, d):
        s, n = T(spark, d, "supplier"), T(spark, d, "nation")
        return (
            n.join(s, s.s_nationkey == n.n_nationkey, "left")
            .groupBy("n_name")
            .agg(
                F.countDistinct("s_suppkey").alias("n_suppliers"),
                F.round(F.avg("s_acctbal"), 4).alias("avg_bal"),
            )
        )

    q["q_distinct_agg"] = q_distinct_agg

    def q_cube(spark, d):
        return (
            T(spark, d, "orders")
            .cube("o_orderstatus", "o_orderpriority")
            .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 4).alias("sum_price"))
            .select(
                F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
                F.coalesce("o_orderpriority", F.lit("ALL")).alias("prio"),
                "n", "sum_price",
            )
        )

    q["q_cube"] = q_cube

    def q_exists_subquery(spark, d):
        c = T(spark, d, "customer")
        big = T(spark, d, "orders").filter(F.col("o_totalprice") > 400_000).select("o_custkey")
        return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
            "c_custkey", "c_acctbal"
        )

    q["q_exists_subquery"] = q_exists_subquery

    def q_in_subquery_anti(spark, d):
        p = T(spark, d, "part")
        li = T(spark, d, "lineitem").filter(F.col("l_quantity") > 45).select("l_partkey")
        return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select(
            "p_partkey", "p_name"
        )

    q["q_in_subquery_anti"] = q_in_subquery_anti

    def q_string_funcs(spark, d):
        s = T(spark, d, "supplier")
        return s.select(
            "s_suppkey",
            F.upper("s_name").alias("uname"),
            F.substring("s_name", 1, 4).alias("prefix"),
            F.concat_ws("|", "s_name", F.lower("s_name")).alias("joined"),
            F.regexp_replace("s_name", "[aeiou]", "_").alias("devowel"),
            F.length("s_name").alias("namelen"),
            F.substring_index("s_name", "#", -1).alias("tail"),
        )

    q["q_string_funcs"] = q_string_funcs

    def q_date_funcs(spark, d):
        o = T(spark, d, "orders")
        return (
            o.groupBy(
                F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month"),
                F.year("o_orderdate").alias("yr"),
                F.quarter("o_orderdate").alias("qtr"),
            )
            .agg(F.count("*").alias("n"), F.round(F.avg("o_totalprice"), 4).alias("avg_price"))
        )

    q["q_date_funcs"] = q_date_funcs

    def q_conditional_agg(spark, d):
        li = T(spark, d, "lineitem")
        return li.groupBy("l_linestatus").agg(
            F.round(
                F.sum(F.when(F.col("l_returnflag") == "R", F.col("l_quantity")).otherwise(0.0)),
                4,
            ).alias("returned_qty"),
            F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("n_discounted"),
            F.count("*").alias("n"),
        )

    q["q_conditional_agg"] = q_conditional_agg

    def q_having(spark, d):
        return (
            T(spark, d, "orders")
            .groupBy("o_custkey")
            .agg(F.count("*").alias("n_orders"))
            .filter(F.col("n_orders") >= 10)
        )

    q["q_having"] = q_having

    def q_multiset_ops(spark, d):
        o = T(spark, d, "orders")
        a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
        b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
        return a.exceptAll(b).groupBy("o_custkey").agg(F.count("*").alias("multiplicity"))

    q["q_multiset_ops"] = q_multiset_ops

    def q_sessionize(spark, d):
        ev = T(spark, d, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        marked = ev.withColumn(
            "new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        )
        return marked.groupBy("user_id").agg(
            F.sum("new_session").alias("n_sessions"), F.count("*").alias("n_events")
        )

    q["q_sessionize"] = q_sessionize

    def q_json_extract(spark, d):
        """JSON scalar extraction (reference flattens JSON during extraction,
        file_extractor.py:206-234; here the typed path: parse + aggregate)."""
        ev = T(spark, d, "events")
        k = F.get_json_object("props", "$.k").cast("int")
        return ev.groupBy("event_type").agg(
            F.round(F.avg(k), 4).alias("avg_k"),
            F.max(k).alias("max_k"),
            F.count("*").alias("n"),
        )

    q["q_json_extract"] = q_json_extract

    def q_math_funcs(spark, d):
        p = T(spark, d, "part")
        return p.select(
            "p_partkey",
            F.round(F.sqrt("p_retailprice"), 6).alias("sq"),
            F.round(F.log("p_retailprice"), 6).alias("ln_price"),
            F.round(F.pow(F.col("p_size").cast("double"), 2.0), 4).alias("size_sq"),
            F.abs(F.col("p_size") - 25).alias("size_dev"),
            F.pmod(F.col("p_partkey"), F.lit(7)).alias("k7"),
        )

    q["q_math_funcs"] = q_math_funcs

    def q_array_funcs(spark, d):
        emb = T(spark, d, "embeddings")
        v = F.col("embedding")
        head = F.slice(v, 1, 8)
        return emb.select(
            "vec_id",
            F.size(v).alias("dim"),
            F.round(
                F.aggregate(head, F.lit(0.0), lambda a, x: a + x.cast("double")), 6
            ).alias("head_sum"),
            F.round(F.array_max(v).cast("double"), 6).alias("vmax"),
            F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        )

    q["q_array_funcs"] = q_array_funcs

    # --- crawl-shaped ops (§2.2 projections, §2.1 admission) ---

    def q_url_canonicalize(spark, d):
        return (
            T(spark, d, "documents")
            .select("doc_id", _url_col().alias("u"))
            .select("doc_id", canonical_url("u").alias("curl"))
        )

    q["q_url_canonicalize"] = q_url_canonicalize

    def q_admission_filter(spark, d):
        from azure_blob_crawler_spark.operators.extraction import file_extension

        docs = T(spark, d, "documents").select("doc_id", _url_col().alias("u"))
        canon = docs.select("doc_id", canonical_url("u").alias("curl"))
        return canon.withColumn("ext", file_extension(F.col("curl"))).filter(
            F.col("ext").isin(*config.ALL_SUPPORTED_EXTENSIONS)
        )

    q["q_admission_filter"] = q_admission_filter

    # --- text analysis (training-data ops) ---

    def q_token_stats(spark, d):
        t = T(spark, d, "documents")
        return t.select(
            "doc_id",
            TXT.token_count(F.col("text")).alias("n_tokens"),
            TXT.word_count(F.col("text")).alias("n_words"),
            TXT.sentence_count(F.col("text")).alias("n_sentences"),
        )

    q["q_token_stats"] = q_token_stats

    def q_quality_lang(spark, d):
        t = T(spark, d, "documents")
        return t.select(
            "doc_id",
            TXT.quality_score(F.col("text")).alias("quality"),
            TXT.lang_id(F.col("text")).alias("lang_pred"),
        )

    q["q_quality_lang"] = q_quality_lang

    def q_fingerprint_dedup(spark, d):
        t = T(spark, d, "documents")
        return (
            t.withColumn("fp", TXT.fingerprint(F.col("text")))
            .groupBy("fp")
            .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("rep_doc"))
        )

    q["q_fingerprint_dedup"] = q_fingerprint_dedup

    def q_text_match(spark, d):
        t = T(spark, d, "documents")
        toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(TXT.TOKEN_PATTERN), 0)
        tf = lambda term: F.size(F.filter(toks, lambda x: x == term))  # noqa: E731
        return (
            t.select("doc_id", (tf("spark") + tf("merge")).alias("score"))
            .filter(F.col("score") > 0)
        )

    q["q_text_match"] = q_text_match

    def q_word_jaccard_pairs(spark, d):
        t = T(spark, d, "documents").filter(F.col("doc_id") < 50)
        words = lambda c: F.array_distinct(  # noqa: E731
            F.split(F.lower(F.trim(c)), r"\s+")
        )
        a = t.select(F.col("doc_id").alias("id_a"), words(F.col("text")).alias("wa"))
        b = t.select(F.col("doc_id").alias("id_b"), words(F.col("text")).alias("wb"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
        jac = F.size(F.array_intersect("wa", "wb")) / F.size(F.array_union("wa", "wb"))
        return (
            pairs.withColumn("jac", F.round(jac, 6))
            .filter(F.col("jac") >= 0.3)
            .select("id_a", "id_b", "jac")
        )

    q["q_word_jaccard_pairs"] = q_word_jaccard_pairs

    # --- embeddings / similarity ---

    def q_embedding_topk(spark, d):
        emb = T(spark, d, "embeddings")
        qv = emb.filter(F.col("vec_id") == 1).select("embedding").collect()[0][0]
        out = SIM.brute_force_topk(emb, [float(x) for x in qv], k=10)
        return out.select("vec_id", F.round("score", 6).alias("score"))

    q["q_embedding_topk"] = q_embedding_topk

    def q_embedding_pair_sims(spark, d):
        emb = T(spark, d, "embeddings").filter(F.col("vec_id") < 40)
        a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
        b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
        return (
            pairs.withColumn("cos_sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
            .filter(F.col("cos_sim") >= 0.15)
            .select("id_a", "id_b", "cos_sim")
        )

    q["q_embedding_pair_sims"] = q_embedding_pair_sims

    # --- spans / chunker / dedup / search (rows-only where noted) ---

    def q_span_counts(spark, d):
        return documents_with_spans(spark, d).select(
            "doc_id", F.size("spans").alias("n_spans")
        ).withColumn("doc_id", F.col("doc_id").cast("long"))

    q["q_span_counts"] = q_span_counts

    def q_chunk_stats(spark, d):  # rows-only: chunker UDF not SQL-expressible
        return (
            _doc_chunks(spark, d)
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_chunks"),
                F.sum("n_tokens").alias("total_tokens"),
                F.max("n_tokens").alias("max_chunk_tokens"),
            )
        )

    q["q_chunk_stats"] = q_chunk_stats

    def q_minhash_dedup(spark, d):  # rows-only: xxhash64 minhash
        t = T(spark, d, "documents")
        return DD.minhash_dedup(t, "text", "doc_id", threshold=0.4).select(
            "doc_id", "lang", "n_chars"
        )

    q["q_minhash_dedup"] = q_minhash_dedup

    def q_simhash_pairs(spark, d):  # rows-only: simhash UDF
        sigs = DD.simhash_signatures(T(spark, d, "documents"), "text", "doc_id")
        return DD.simhash_pairs(sigs, max_hamming=8)

    q["q_simhash_pairs"] = q_simhash_pairs

    def q_embedding_near_dups(spark, d):  # rows-only: LSH bucketing
        # plant exact duplicates (vec_id + 100000) so the LSH path provably
        # recovers each (i, i+100000) pair at cos=1.0
        emb = T(spark, d, "embeddings").select("vec_id", "embedding")
        planted = emb.withColumn("vec_id", F.col("vec_id") + 100_000)
        pairs = DD.embedding_near_dups(emb.union(planted), threshold=0.99, dim=EMBED_DIM)
        return pairs.select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))

    q["q_embedding_near_dups"] = q_embedding_near_dups

    def q_bm25_search(spark, d):  # rows-only: corpus-statistic scoring
        chunks = _doc_chunks(spark, d, embed=False)
        return Q.text_search(chunks, "spark shuffle partition", top=20).select(
            "chunk_id", F.round("score", 6).alias("score")
        )

    q["q_bm25_search"] = q_bm25_search

    def q_hybrid_search(spark, d):  # rows-only: RRF over engine chunks
        chunks = _doc_chunks(spark, d)
        return Q.run_query(
            chunks, query_text="merge snapshot commit", search_type="hybrid",
            top=20, embed_dim=EMBED_DIM,
        ).select("chunk_id", F.round("score", 6).alias("score"))

    q["q_hybrid_search"] = q_hybrid_search

    def q_ivf_topk(spark, d):  # rows-only: ANN scale path (IVF probe)
        emb = T(spark, d, "embeddings")
        cents = SIM.train_centroids(emb, n_cells=8, sample=512)
        qv = emb.filter(F.col("vec_id") == 1).select("embedding").collect()[0][0]
        with_cells = SIM.assign_cells(emb, cents)
        return SIM.ivf_topk(with_cells, cents, [float(x) for x in qv], k=10, n_probe=3).select(
            "vec_id", F.round("score", 6).alias("score")
        )

    q["q_ivf_topk"] = q_ivf_topk

    def q_claim_oracle(spark, d):
        """Politeness claim over a documents-derived frontier — the scheduler
        operator checked against pure SQL windows in DuckDB."""
        from azure_blob_crawler_spark.functions.urls import url_hash, url_host
        from azure_blob_crawler_spark.operators.scheduler import claim_round

        docs = T(spark, d, "documents").select("doc_id", _url_col().alias("u"))
        frontier = (
            docs.select(
                canonical_url("u").alias("url"),
                (F.col("doc_id") % 3).cast("int").alias("depth"),
                F.col("doc_id").alias("discovery_seq"),
            )
            .withColumn("host", url_host(F.col("url")))
            .withColumn("url_hash", url_hash(F.col("url")))
            .withColumn("state", F.lit("pending"))
            .withColumn("attempts", F.lit(0))
        )
        host_id = F.regexp_extract("host", r"host(\d+)", 1).cast("int")
        robots = (
            frontier.select("host", host_id.alias("hid"))
            .distinct()
            .select(
                "host",
                F.when(F.col("hid") == 0, 5.0)
                .when(F.col("hid") % 7 == 0, 0.5)
                .otherwise(F.lit(None).cast("double"))
                .alias("crawl_delay_s"),
            )
        )
        claimed = claim_round(frontier, robots, round_size=100, round_seconds=10.0)
        return claimed.select("claim_rank", "url", "host", "depth")

    q["q_claim_oracle"] = q_claim_oracle

    def q_frontier_claim(spark, d):  # rows-only: scheduler (ordering pinned in tests)
        from azure_blob_crawler_spark.functions.urls import url_hash, url_host
        from azure_blob_crawler_spark.operators.scheduler import claim_round
        from azure_blob_crawler_spark.sources.synthetic import robots_df, seed_frontier_df

        seeds = seed_frontier_df(spark, 5000)
        frontier = (
            seeds.withColumn("url", canonical_url("url"))
            .withColumn("host", url_host(F.col("url")))
            .withColumn("url_hash", url_hash(F.col("url")))
            .dropDuplicates(["url_hash"])
            .withColumn("state", F.lit("pending"))
            .withColumn("attempts", F.lit(0))
        )
        return claim_round(frontier, robots_df(spark), round_size=200).select(
            "claim_rank", "url", "host", "depth"
        )

    q["q_frontier_claim"] = q_frontier_claim

    return q


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    tok = TXT.token_count_sql("text")
    wc = TXT.word_count_sql("text")
    sc = TXT.sentence_count_sql("text")

    canon_sub = canonicalize_sql(
        "u", "duckdb",
        from_clause=f"(select doc_id, {_URL_SQL} as u from documents)",
    )

    return {
        "q1_pricing_summary": """
            select l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) as sum_qty,
                   round(sum(l_extendedprice), 4) as sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) as sum_disc_price,
                   round(avg(l_quantity), 4) as avg_qty,
                   count(*) as count_order
            from lineitem
            where l_shipdate <= timestamp '1998-09-02'
            group by l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": """
            select o_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) as revenue
            from customer
            join orders on c_custkey = o_custkey
            join lineitem on o_orderkey = l_orderkey
            where c_mktsegment = 'BUILDING'
              and o_orderdate < timestamp '1998-01-01'
              and l_shipdate > timestamp '1998-01-01'
            group by o_orderkey
            order by revenue desc, o_orderkey asc
            limit 10
        """,
        "q5_supplier_volume": """
            select r_name, n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) as revenue
            from region
            join nation on n_regionkey = r_regionkey
            join customer on c_nationkey = n_nationkey
            join orders on o_custkey = c_custkey
            join lineitem on l_orderkey = o_orderkey
            join supplier on s_suppkey = l_suppkey and s_nationkey = c_nationkey
            group by r_name, n_name
        """,
        "q_window_rank": """
            select o_custkey, o_orderkey, rk from (
                select o_custkey, o_orderkey,
                       row_number() over (partition by o_custkey
                                          order by o_totalprice desc, o_orderkey asc) as rk
                from orders
            ) where rk <= 3
        """,
        "q_events_lag": """
            select user_id, count(*) as n_events, round(sum(diff), 4) as sum_diff
            from (
                select user_id,
                       value - lag(value) over (partition by user_id
                                                order by ts, event_id) as diff
                from events
            )
            group by user_id
        """,
        "q_events_tumbling": """
            select strftime(time_bucket(interval '1 hour', ts), '%Y-%m-%d %H:%M:%S') as wstart,
                   event_type, count(*) as n, round(sum(value), 4) as sum_value
            from events
            group by 1, 2
        """,
        "q_rollup": """
            select coalesce(r_name, 'ALL') as r, coalesce(n_name, 'ALL') as n,
                   count(*) as n_cust, round(sum(c_acctbal), 4) as sum_bal
            from region
            join nation on n_regionkey = r_regionkey
            join customer on c_nationkey = n_nationkey
            group by rollup(r_name, n_name)
        """,
        "q_setops": """
            select distinct c_custkey from (
                (select c_custkey from customer where c_mktsegment = 'BUILDING'
                 intersect
                 select c_custkey from customer
                 where c_custkey in (select o_custkey from orders)
                 except
                 select c_custkey from customer where c_acctbal >= 100)
                union
                select c_custkey from customer
                where c_mktsegment = 'MACHINERY'
                  and c_custkey not in (select o_custkey from orders)
            )
        """,
        "q_semi_anti_counts": """
            select n_name,
                   coalesce(s.n_with_orders, 0) as n_with_orders,
                   coalesce(a.n_without_orders, 0) as n_without_orders
            from nation
            left join (
                select c_nationkey, count(*) as n_with_orders from customer
                where c_custkey in (select o_custkey from orders)
                group by c_nationkey
            ) s on n_nationkey = s.c_nationkey
            left join (
                select c_nationkey, count(*) as n_without_orders from customer
                where c_custkey not in (select o_custkey from orders)
                group by c_nationkey
            ) a on n_nationkey = a.c_nationkey
        """,
        "q_topk_orders": """
            select o_orderkey, o_custkey, o_totalprice,
                   strftime(o_orderdate, '%Y-%m-%d') as o_date
            from orders
            order by o_totalprice desc, o_orderkey asc
            limit 10
        """,
        "q_filter_project": """
            select p_partkey, p_name, p_retailprice
            from part
            where p_size between 10 and 30 and p_type = 'ECONOMY'
        """,
        "q_distinct_agg": """
            select n_name,
                   count(distinct s_suppkey) as n_suppliers,
                   round(avg(s_acctbal), 4) as avg_bal
            from nation
            left join supplier on s_nationkey = n_nationkey
            group by n_name
        """,
        "q_cube": """
            select coalesce(o_orderstatus, 'ALL') as status,
                   coalesce(o_orderpriority, 'ALL') as prio,
                   count(*) as n, round(sum(o_totalprice), 4) as sum_price
            from orders
            group by cube(o_orderstatus, o_orderpriority)
        """,
        "q_exists_subquery": """
            select c_custkey, c_acctbal from customer
            where exists (select 1 from orders
                          where o_custkey = c_custkey and o_totalprice > 400000)
        """,
        "q_in_subquery_anti": """
            select p_partkey, p_name from part
            where p_partkey not in (select l_partkey from lineitem where l_quantity > 45)
        """,
        "q_string_funcs": """
            select s_suppkey,
                   upper(s_name) as uname,
                   substr(s_name, 1, 4) as prefix,
                   concat_ws('|', s_name, lower(s_name)) as joined,
                   regexp_replace(s_name, '[aeiou]', '_', 'g') as devowel,
                   length(s_name) as namelen,
                   split_part(s_name, '#', -1) as tail
            from supplier
        """,
        "q_date_funcs": """
            select strftime(date_trunc('month', o_orderdate), '%Y-%m') as month,
                   year(o_orderdate) as yr,
                   quarter(o_orderdate) as qtr,
                   count(*) as n, round(avg(o_totalprice), 4) as avg_price
            from orders
            group by 1, 2, 3
        """,
        "q_conditional_agg": """
            select l_linestatus,
                   round(sum(case when l_returnflag = 'R' then l_quantity else 0.0 end), 4)
                       as returned_qty,
                   sum(case when l_discount > 0.05 then 1 else 0 end)::bigint as n_discounted,
                   count(*) as n
            from lineitem
            group by l_linestatus
        """,
        "q_having": """
            select o_custkey, count(*) as n_orders
            from orders group by o_custkey having count(*) >= 10
        """,
        "q_multiset_ops": """
            select o_custkey, count(*) as multiplicity from (
                select o_custkey from orders where o_orderstatus = 'O'
                except all
                select o_custkey from orders where o_orderpriority = '1-URGENT'
            ) group by o_custkey
        """,
        "q_sessionize": """
            select user_id, sum(new_session)::bigint as n_sessions, count(*) as n_events
            from (
                select user_id,
                       case when lag(ts) over (partition by user_id order by ts, event_id)
                                 is null
                              or epoch(ts) - epoch(lag(ts) over (partition by user_id
                                                                 order by ts, event_id)) > 1800
                            then 1 else 0 end as new_session
                from events
            ) group by user_id
        """,
        "q_url_canonicalize": f"""
            select doc_id, canon as curl from ({canon_sub})
        """,
        "q_admission_filter": f"""
            select doc_id, curl,
                   case when curl like '%.%'
                        then lower(split_part(curl, '.', -1)) else '' end as ext
            from (select doc_id, canon as curl from ({canon_sub}))
            where case when curl like '%.%'
                       then lower(split_part(curl, '.', -1)) else '' end
                  in ('txt','md','csv','json','pdf','docx','doc')
        """,
        "q_token_stats": f"""
            select doc_id, {tok} as n_tokens, {wc} as n_words, {sc} as n_sentences
            from documents
        """,
        "q_quality_lang": f"""
            select doc_id,
                   {TXT.quality_score_sql("text")} as quality,
                   {TXT.lang_id_sql("text")} as lang_pred
            from documents
        """,
        "q_fingerprint_dedup": f"""
            select {TXT.fingerprint_sql("text")} as fp,
                   count(*) as n_docs, min(doc_id) as rep_doc
            from documents
            group by 1
        """,
        "q_text_match": """
            select doc_id,
                   len(list_filter(regexp_extract_all(lower(text), '\\w{1,8}|[^\\w\\s]'),
                                   t -> t = 'spark'))
                 + len(list_filter(regexp_extract_all(lower(text), '\\w{1,8}|[^\\w\\s]'),
                                   t -> t = 'merge')) as score
            from documents
            where len(list_filter(regexp_extract_all(lower(text), '\\w{1,8}|[^\\w\\s]'),
                                  t -> t = 'spark'))
                + len(list_filter(regexp_extract_all(lower(text), '\\w{1,8}|[^\\w\\s]'),
                                  t -> t = 'merge')) > 0
        """,
        "q_word_jaccard_pairs": """
            with w as (
                select doc_id,
                       list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) as ws
                from documents where doc_id < 50
            )
            select a.doc_id as id_a, b.doc_id as id_b,
                   round(len(list_intersect(a.ws, b.ws))::double
                         / len(list_distinct(list_concat(a.ws, b.ws))), 6) as jac
            from w a join w b on a.doc_id < b.doc_id
            where len(list_intersect(a.ws, b.ws))::double
                  / len(list_distinct(list_concat(a.ws, b.ws))) >= 0.3
        """,
        "q_embedding_topk": f"""
            with qv as (select embedding as q from embeddings where vec_id = 1)
            select vec_id, round({cosine_sql('embedding', 'q')}, 6) as score
            from embeddings, qv
            order by {cosine_sql('embedding', 'q')} desc, vec_id asc
            limit 10
        """,
        "q_embedding_pair_sims": f"""
            select a.vec_id as id_a, b.vec_id as id_b,
                   round({cosine_sql('a.embedding', 'b.embedding')}, 6) as cos_sim
            from embeddings a join embeddings b on a.vec_id < b.vec_id
            where a.vec_id < 40 and b.vec_id < 40
              and round({cosine_sql('a.embedding', 'b.embedding')}, 6) >= 0.15
        """,
        "q_json_extract": """
            select event_type,
                   round(avg(cast(json_extract_string(props, '$.k') as int)), 4) as avg_k,
                   max(cast(json_extract_string(props, '$.k') as int)) as max_k,
                   count(*) as n
            from events
            group by event_type
        """,
        "q_math_funcs": """
            select p_partkey,
                   round(sqrt(p_retailprice), 6) as sq,
                   round(ln(p_retailprice), 6) as ln_price,
                   round(pow(p_size::double, 2.0), 4) as size_sq,
                   abs(p_size - 25) as size_dev,
                   p_partkey % 7 as k7
            from part
        """,
        "q_array_funcs": """
            select vec_id,
                   len(embedding) as dim,
                   round(list_sum(list_transform(embedding[1:8], x -> x::double)), 6)
                       as head_sum,
                   round(list_max(embedding)::double, 6) as vmax,
                   len(list_filter(embedding, x -> x > 0)) as n_pos
            from embeddings
        """,
        "q_claim_oracle": f"""
            with frontier as (
                select canon as url,
                       cast(doc_id % 3 as int) as depth,
                       doc_id as discovery_seq,
                       split_part(split_part(canon, '://', 2), '/', 1) as host
                from ({canon_sub})
            ),
            budgeted as (
                select *,
                       cast(regexp_extract(host, 'host(\\d+)', 1) as int) as hid
                from frontier
            ),
            ranked as (
                select url, host, depth, discovery_seq,
                       greatest(cast(floor(10.0 / (case when hid = 0 then 5.0
                                                        when hid % 7 = 0 then 0.5
                                                        else 1.0 end)) as int), 1)
                           as host_budget,
                       row_number() over (partition by host
                                          order by depth, discovery_seq, url) as host_rank
                from budgeted
            ),
            eligible as (
                select * from ranked where host_rank <= host_budget
                order by depth, discovery_seq, url
                limit 100
            )
            select cast(row_number() over (order by depth, discovery_seq, url) as int)
                       as claim_rank,
                   url, host, depth
            from eligible
        """,
        "q_span_counts": """
            select doc_id,
                   case
                     when doc_id % 4 = 0 then 1
                     when doc_id % 4 = 3 then 2
                     else greatest(
                       cast(ceil(len(list_filter(string_split(text, '.'),
                                                 s -> trim(s) <> '')) / 3.0) as int),
                       1)
                   end as n_spans
            from documents
        """,
    }
