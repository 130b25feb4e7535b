"""Top-k query surface over the chunks table — the engine twin of the
reference's MCP search path (services/mcp_server/app/app.py:66-135 +
shared/azure_clients/search_client.py:199-374).

Modes (search_client.py:25-29 enum): text (BM25), vector (cosine k-NN),
hybrid (RRF fusion). Exact computation at every scale tier that fits —
the reference's HNSW index (index.json:44-55) is an ANN approximation of
the same cosine ordering; exactness supersedes approximation for the
correctness oracle, and the LSH-bucketed path in operators/similarity.py
is the 10^10-scale approximate variant.

All scoring is Catalyst-native: tokenization by split/explode, BM25 as a
grouped aggregation over a posting-list DataFrame, cosine via higher-order
functions against a broadcast query vector, RRF as two rank windows.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from azure_blob_crawler_spark import config
from azure_blob_crawler_spark.functions.embedding import embed_query
from azure_blob_crawler_spark.functions.text import TOKEN_PATTERN
from azure_blob_crawler_spark.functions.vectors import cosine

BM25_K1 = 1.2
BM25_B = 0.75


def _tokens(col):
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), 0)


def text_search(
    chunks: DataFrame,
    query: str,
    top: int = config.DEFAULT_TOP,
    content_col: str = "content",
    id_col: str = "chunk_id",
) -> DataFrame:
    """Exact BM25 over the chunk corpus; returns top-k with ``score``.

    Scale shape: one groupBy(id) over exploded postings of the *query terms
    only* (the term filter prunes before the shuffle), then a broadcast join
    of per-term document frequencies.
    """
    q_terms = [t for t in _py_tokens(query)]
    if not q_terms:
        return chunks.select(id_col).limit(0).withColumn("score", F.lit(0.0))
    # BM25 traverses the corpus 3× (stats, postings, result join) — cache the
    # input so an expensive lineage (e.g. the chunker pipeline) runs once
    chunks = chunks.persist()
    n_docs = chunks.count()
    avg_len = (
        chunks.select(F.avg(F.size(_tokens(F.col(content_col)))).alias("a")).collect()[0]["a"]
        or 1.0
    )
    terms_lit = F.array(*[F.lit(t) for t in set(q_terms)])
    postings = (
        chunks.select(
            id_col,
            F.size(_tokens(F.col(content_col))).alias("doc_len"),
            F.explode(_tokens(F.col(content_col))).alias("term"),
        )
        .filter(F.array_contains(terms_lit, F.col("term")))
        .groupBy(id_col, "term", "doc_len")
        .agg(F.count("*").alias("tf"))
    )
    df_by_term = postings.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_norm = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("doc_len") / F.lit(float(avg_len)))
    )
    scored = (
        postings.join(F.broadcast(df_by_term), "term")
        .withColumn("term_score", idf * tf_norm)
        .groupBy(id_col)
        .agg(F.sum("term_score").alias("score"))
    )
    out = chunks.join(scored, id_col, "inner")
    return out.orderBy(F.desc("score"), F.asc(id_col)).limit(min(top, config.MAX_TOP))


def _py_tokens(text: str) -> list[str]:
    import re

    return re.findall(TOKEN_PATTERN, text.lower())


def vector_search(
    chunks: DataFrame,
    query_vector: list[float] | None = None,
    query_text: str | None = None,
    top: int = config.DEFAULT_TOP,
    vector_col: str = "vector",
    id_col: str = "chunk_id",
    embed_dim: int = config.TEST_EMBEDDING_DIM,
) -> DataFrame:
    """Exact cosine top-k against a broadcast query vector
    (search_client.py:249-259 semantics; embedding of the query mirrors
    mcp app.py:85-94)."""
    if query_vector is None:
        if query_text is None:
            raise ValueError("vector search requires query_vector or query_text")
        query_vector = embed_query(query_text, embed_dim)
    qv = F.array(*[F.lit(float(x)) for x in query_vector])
    scored = chunks.withColumn("score", cosine(F.col(vector_col), qv))
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(min(top, config.MAX_TOP))


def hybrid_search(
    chunks: DataFrame,
    query_text: str,
    top: int = config.DEFAULT_TOP,
    rrf_k: int = config.RRF_K,
    content_col: str = "content",
    vector_col: str = "vector",
    id_col: str = "chunk_id",
    embed_dim: int = config.TEST_EMBEDDING_DIM,
    pool: int = config.MAX_TOP,
) -> DataFrame:
    """Reciprocal-rank fusion of text + vector rankings
    (search_client.py:298-324 — Azure fuses server-side with RRF;
    score = Σ 1/(k + rank))."""
    chunks = chunks.persist()  # consumed by both rankers + the result join
    t = text_search(chunks, query_text, top=pool, content_col=content_col, id_col=id_col)
    v = vector_search(
        chunks, query_text=query_text, top=pool, vector_col=vector_col,
        id_col=id_col, embed_dim=embed_dim,
    )
    w_t = Window.orderBy(F.desc("score"), F.asc(id_col))
    tr = t.select(id_col, F.row_number().over(w_t).alias("rank_text"))
    vr = v.select(id_col, F.row_number().over(w_t).alias("rank_vec"))
    fused = (
        tr.join(vr, id_col, "full_outer")
        .withColumn(
            "score",
            F.coalesce(1.0 / (F.lit(rrf_k) + F.col("rank_text")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("rank_vec")), F.lit(0.0)),
        )
    )
    out = chunks.join(fused.select(id_col, "score"), id_col, "inner")
    return out.orderBy(F.desc("score"), F.asc(id_col)).limit(min(top, config.MAX_TOP))


def run_query(
    chunks: DataFrame,
    query_text: str | None = None,
    search_type: str = "text",
    top: int = config.DEFAULT_TOP,
    select_fields: list[str] | None = None,
    filter_expr: str | None = None,
    include_vector: bool = False,
    embed_dim: int = config.TEST_EMBEDDING_DIM,
) -> DataFrame:
    """Full query path: validate → filter → score → top-k → project.

    Mirrors mcp app.py:66-135: top clamp (≤100, :97), OData-ish pre-filter
    (:96), field selection (:104-121), vector-field exclusion (:127).
    Wildcard '*' returns the match-all scan capped at GET_ALL_DOCS_CAP
    (:156-165)."""
    if search_type not in ("text", "vector", "hybrid"):
        raise ValueError(f"unknown search_type: {search_type}")  # search_client.py:230-236
    if search_type in ("text", "hybrid") and not query_text:
        raise ValueError("text/hybrid search requires query_text")
    base = chunks.filter(F.expr(filter_expr)) if filter_expr else chunks
    top = min(top, config.MAX_TOP)
    if query_text == "*":
        out = base.limit(config.GET_ALL_DOCS_CAP).withColumn("score", F.lit(1.0))
    elif search_type == "text":
        out = text_search(base, query_text, top)
    elif search_type == "vector":
        out = vector_search(base, query_text=query_text, top=top, embed_dim=embed_dim)
    else:
        out = hybrid_search(base, query_text, top, embed_dim=embed_dim)
    if select_fields:
        keep = list(select_fields) + (["score"] if "score" not in select_fields else [])
        out = out.select(*keep)
    if not include_vector and "vector" in out.columns:
        out = out.drop("vector")  # field exclusion, app.py:127 + settings.py:147
    return out
