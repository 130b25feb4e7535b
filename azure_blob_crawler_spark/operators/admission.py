"""Admission-control filters — Catalyst-native predicates that run BEFORE any
pandas UDF so Catalyst can push them into the scan (the reference hand-orders
the same checks before download: handlers.py:188-192, file_extractor.py:69-76,
document_processor.py:303-305).

Rejected rows are routed, not dropped: ``split_admission`` returns
(admitted, skipped-with-reason) so the skipped table mirrors the reference's
ProcessingSkippedError path (exceptions.py, servicebus_processor.py:221-231).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from azure_blob_crawler_spark import config
from azure_blob_crawler_spark.operators.extraction import file_extension

MAX_BYTES = config.MAX_FILE_SIZE_MB * 1024 * 1024


def extension_allowed(name: Column) -> Column:
    """Extension allow-list (handlers.py:188-192, settings.py:92-95)."""
    return file_extension(name).isin(*config.ALL_SUPPORTED_EXTENSIONS)


def size_allowed(size_bytes: Column) -> Column:
    """100 MB cap (file_extractor.py:69-76)."""
    return size_bytes <= F.lit(MAX_BYTES)


def nonempty_content(full_content: Column) -> Column:
    """Blank-extraction skip (document_processor.py:303-305)."""
    return F.trim(full_content) != ""


def split_admission(
    df: DataFrame,
    name_col: str = "url",
    size_col: str = "size",
    enforce_extension: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Returns (admitted, skipped). ``skipped`` carries a ``skip_reason``.

    ``enforce_extension`` mirrors the reference's path asymmetry: the webhook
    path filters extensions, the queue path does not (SURVEY.md §3.2 note).
    """
    name, size = F.col(name_col), F.col(size_col)
    reason = F.when(~size_allowed(size), F.lit("size_exceeds_limit"))
    if enforce_extension:
        reason = reason.when(~extension_allowed(name), F.lit("unsupported_extension"))
    tagged = df.withColumn("skip_reason", reason)
    admitted = tagged.filter(F.col("skip_reason").isNull()).drop("skip_reason")
    skipped = tagged.filter(F.col("skip_reason").isNotNull())
    return admitted, skipped
