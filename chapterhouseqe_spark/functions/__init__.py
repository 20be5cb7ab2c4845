"""Text-analysis function library for document pipelines."""

from chapterhouseqe_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)

__all__ = ["doc_fingerprint", "lang_id", "quality_score", "token_count"]
