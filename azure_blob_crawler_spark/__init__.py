"""spark-crawl-frontier: a PySpark-native URL-frontier + document-processing
engine with the capabilities of the reference Azure event-driven blob indexer
(see SURVEY.md).

Everything is expressed against the DataFrame API; per-row text work runs
through Arrow-vectorized pandas UDFs only (never per-row Python UDFs).
"""

from azure_blob_crawler_spark import config  # noqa: F401

__version__ = "0.1.0"
