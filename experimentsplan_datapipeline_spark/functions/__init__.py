"""Scalar function library (all JVM-side built-ins; no Python UDFs here)."""

from experimentsplan_datapipeline_spark.functions.strings import (
    basename,
    composite_key,
    extract_step,
    first_token,
    parse_s3_uri,
    path_join,
    stem_from_name,
    strip_ext,
    template_caption,
)
from experimentsplan_datapipeline_spark.functions.text import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
)
from experimentsplan_datapipeline_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "basename", "composite_key", "extract_step", "first_token",
    "parse_s3_uri", "path_join", "stem_from_name", "strip_ext",
    "template_caption",
    "doc_fingerprint", "language_id", "quality_score", "token_count",
    "cosine_similarity", "dot_product", "l2_norm",
]
