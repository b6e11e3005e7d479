"""Generic user-defined table-function surface (SURVEY §2.5 U1).

The reference registers a ``Split`` TableFunction into the session
catalog by name and invokes it through SQL ``LATERAL TABLE(split(...))``
(EnrichmentApp.java:364-374, registration :51, use :225-233). The
production Spark path for that exact job is ``F.explode(F.split(...))``
— a Catalyst expression, JVM-side, whole-stage-codegen'd
(`operators/enrichment.py:explode_delimited`).

This module is the *generic* surface: arbitrary Python table functions
registered by name and callable from SQL with ``LATERAL``, for logic a
built-in can't express. Arrow-optimized (`useArrow=True`) so rows move
in batches, but still the slow path relative to built-ins — prefer
Catalyst expressions wherever semantics allow.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="token string, pos int", useArrow=True)
class SplitTokens:
    """Emit one row per delimiter-separated token with its position.

    Faithful to the reference's Split (emits raw tokens; trimming and
    empty-token filtering stay in the calling SQL, mirroring
    EnrichmentApp.java:229-231's WHERE TRIM(ip) <> '').
    """

    def eval(self, s: str, delim: str):
        if s is None or delim is None:
            return
        for i, tok in enumerate(s.split(delim)):
            yield (tok, i)


def register_udtfs(spark: SparkSession) -> None:
    """Register the table-function library into the session catalog
    (idempotent), mirroring the reference's createTemporarySystemFunction."""
    spark.udtf.register("split_tokens", SplitTokens)
