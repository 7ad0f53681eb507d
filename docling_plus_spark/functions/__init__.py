"""Column-expression library (JVM-side, whole-stage-codegen friendly).

Every function here returns a pure ``pyspark.sql.Column`` built from
built-in functions — no Python UDFs — so Catalyst can push filters into
the scan, prune columns, and keep the hot path inside codegen. Each has
an ANSI-SQL twin used as the DuckDB oracle in ``__spark_entry__``.
"""

from .expressions import (  # noqa: F401
    doc_hash,
    fingerprint_md5,
    langid_expr,
    md5_long,
    quality_score,
    sniff_format,
    token_count,
    unicode_clean,
)
