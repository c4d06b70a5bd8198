"""String / path scalar functions (SURVEY.md §2.7, X1-X12).

Re-expresses the reference's filename-convention parsing as Catalyst
expressions so the optimizer can constant-fold, push down, and codegen them.
Reference semantics (file:line into /root/reference):

- stem extraction: strip ``_person``/``_vton`` suffix, split on ``_cloth_``
  (train/common/dataset.py:229-253)
- s3:// URI parse -> (bucket, key) (train/common/dataset.py:255-269)
- basename / splitext (train/common/dataset.py:134,237)
- first-token id ``file.split('_')[0]`` (train/common/metrics.py:300)
- regex step extraction (train/train_stage_1/utils.py:41-51)
- caption templates / path composition (train/train_CATVTON/dataloader.py:85-93)
- composite key ``{person_id}_{garment_id}`` (train/train_CP_VTON/dataloader.py:61)

Every function takes and returns Columns — pure expression builders.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def basename(path: Column | str) -> Column:
    """Last path segment: ``element_at(split(path, '/'), -1)``."""
    return F.element_at(F.split(F.col(path) if isinstance(path, str) else path, "/"), -1)


def strip_ext(name: Column | str) -> Column:
    """Filename without its final ``.ext`` (splitext semantics)."""
    c = F.col(name) if isinstance(name, str) else name
    return F.regexp_replace(c, r"\.[^./]+$", "")


def stem_from_name(name: Column | str) -> Column:
    """Extract the sample stem from a convention-named file.

    ``{stem}_person.png`` -> stem; ``{stem}_cloth_{variant}.png`` -> stem;
    ``{stem}_vton.png`` -> stem (reference train/common/dataset.py:229-253).
    Falls back to the extension-stripped name when no convention matches.
    """
    base = strip_ext(name)
    return (
        F.when(base.rlike("_cloth_"), F.split(base, "_cloth_").getItem(0))
        .when(base.rlike("_person$"), F.regexp_extract(base, r"^(.+)_person$", 1))
        .when(base.rlike("_vton$"), F.regexp_extract(base, r"^(.+)_vton$", 1))
        .otherwise(base)
    )


def image_type_from_name(name: Column | str) -> Column:
    """Classify a convention-named file into its triplet slot."""
    base = strip_ext(name)
    return (
        F.when(base.rlike("_cloth_"), F.lit("cloth_image"))
        .when(base.rlike("_person$"), F.lit("initial_image"))
        .when(base.rlike("_vton$"), F.lit("try_on_image"))
        .otherwise(F.lit(None).cast("string"))
    )


def parse_s3_uri(uri: Column | str) -> Column:
    """``s3://bucket/key...`` -> struct(bucket, key)."""
    c = F.col(uri) if isinstance(uri, str) else uri
    stripped = F.regexp_replace(c, "^s3a?://", "")
    return F.struct(
        F.split(stripped, "/").getItem(0).alias("bucket"),
        F.regexp_replace(stripped, "^[^/]+/", "").alias("key"),
    )


def first_token(name: Column | str, sep: str = "_") -> Column:
    """``file.split(sep)[0]`` (reference metrics.py:300). ``sep`` is a
    LITERAL separator (escaped before the regex split), matching Python's
    str.split semantics — a '.' or '|' sep splits on the character, not
    on everything."""
    import re

    c = F.col(name) if isinstance(name, str) else name
    return F.split(c, re.escape(sep)).getItem(0)


def extract_step(path: Column | str, pattern: str = r"checkpoint-step-(\d+)") -> Column:
    """Regex-extract the training step number as a long (utils.py:41-51)."""
    c = F.col(path) if isinstance(path, str) else path
    return F.regexp_extract(c, pattern, 1).cast("long")


def composite_key(*cols: Column | str, sep: str = "_") -> Column:
    """``{a}_{b}`` composite join key (train_CP_VTON/dataloader.py:61)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.concat_ws(sep, *cs)


def path_join(*parts: Column | str) -> Column:
    """Compose a path with '/' separators; string literals pass through."""
    cs = [F.lit(p) if isinstance(p, str) else p for p in parts]
    return F.concat_ws("/", *cs)


def template_caption(template: str, *cols: Column | str) -> Column:
    """printf-style caption, e.g. ``format_string('a person wearing %s', id)``."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.format_string(template, *cs)
