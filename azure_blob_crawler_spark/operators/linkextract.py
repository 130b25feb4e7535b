"""Link extraction — engine-only operator (the reference receives work from
Event Grid, deploy-infrastructure.ps1:495-501; a crawler must discover).

Fully Catalyst-native: ``regexp_extract_all`` over the document's full
content pulls href anchors with their in-document position (posexplode), no
Python anywhere. Canonicalization/hashing reuse functions/urls.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_blob_crawler_spark.functions.urls import (
    canonical_url,
    resolve_href,
    url_hash,
    url_host,
)

HREF_PATTERN = r'href="([^"]+)"'


def extract_links(
    docs: DataFrame, content_col: str = "full_content", base_col: str = "url"
) -> DataFrame:
    """(doc columns) -> one row per extracted link with ``link_idx`` position.

    Relative hrefs (``/page2``, ``page2.html``, ``//h/p``, ``?q=1``) resolve
    against the source document's URL (``base_col``) before canonicalization;
    unsupported schemes (mailto:, javascript:, ...) and fragment-only hrefs
    are dropped. ``link_idx`` keeps the ORIGINAL in-document anchor position
    (dropped rows leave gaps), so discovery order of surviving links is
    unchanged by the filtering.

    Output: all input columns + link_idx int, link_url (canonical),
    link_host, link_hash.
    """
    anchors = F.regexp_extract_all(F.col(content_col), F.lit(HREF_PATTERN), 1)
    exploded = docs.select(
        "*", F.posexplode_outer(anchors).alias("link_idx", "raw_link")
    ).filter(F.col("raw_link").isNotNull())
    resolved = resolve_href(F.col(base_col), F.col("raw_link"))
    canon = canonical_url(resolved)
    return (
        exploded.withColumn("link_url", canon)
        .filter(F.col("link_url").isNotNull())
        .withColumn("link_host", url_host(F.col("link_url")))
        .withColumn("link_hash", url_hash(F.col("link_url")))
        .drop("raw_link")
    )
