"""Exact set-similarity join with prefix filtering (AllPairs/PPJoin
family — Bayardo et al. WWW'07, Xiao et al. WWW'08; re-derived from the
published algorithm, DataFrame-native).

This is the EXACT counterpart to the MinHash-LSH path: every pair with
Jaccard ≥ t is returned, no recall loss, yet no O(n²) pair loop. The
reference's dedup stage (EnrichmentApp.java:142-156) is equality-based;
this generalizes it to content similarity with a correctness guarantee
LSH can't give.

Prefix principle (the one-sided form used here): order every document's
shingles by ascending global document frequency (rarest first, ties by
token). If jaccard(A, B) ≥ t, then |A∩B| ≥ t·|A∪B| ≥ t·|A|, so the
suffix of A — its ⌈t·|A|⌉ − 1 most-frequent shingles — cannot contain
ALL common shingles: at least one common shingle lies in A's prefix of
length |A| − ⌈t·|A|⌉ + 1. Hence joining PREFIX postings of the lower-id
side against FULL postings of the higher-id side finds every
qualifying pair. Hot shingles sort to the END of the frequency order,
so they rarely enter prefixes — the candidate join's per-token cost is
df_prefix(token)·df(token), not df(token)², which is what kills the
head-of-Zipf blowup an unfiltered inverted-index join suffers.

Scale shape: three shuffles — postings groupBy(token) for df, a window
per doc_id for prefix ranks, the candidate equi-join on token — all on
(id, token) pairs, never document bodies. The final verify joins the
persisted shingle table by id for the candidate set only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flink_application_spark.operators.minhash import with_shingles

# Float-safety slack on the t·|A| bounds: real-arithmetic guarantees
# must not be voided by a last-ulp rounding of t*size.
_EPS = 1e-9


def _ranked_postings(
    docs: DataFrame,
    threshold: float,
    *,
    id_col: str,
    text_col: str,
    shingles: DataFrame | None = None,
):
    """Shared prefix-filter machinery for both set-similarity joins:
    the (persisted) shingle table, plus PREFIX and FULL posting
    projections ranked under the global (document-frequency, token)
    order. `shingles` lets a caller that already materialized the
    [id_col, shingles] table (restricted to non-NULL-text documents —
    the joins' documented contract) reuse it instead of re-tokenizing
    the corpus. Returns (sh, prefix, full)."""
    if shingles is None:
        docs = docs.filter(F.col(text_col).isNotNull())
        sh = with_shingles(docs, text_col=text_col, id_col=id_col).select(
            F.col(id_col).alias("id"), "shingles"
        )
    else:
        sh = shingles.select(F.col(id_col).alias("id"), "shingles")
    sh = sh.withColumn("sz", F.size("shingles")).persist()

    post = sh.select("id", "sz", F.explode("shingles").alias("tok"))
    tok_df = post.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    # One ranking pass serves both sides: token rank within each doc
    # under the global (df, tok) order.
    w = Window.partitionBy("id").orderBy(F.col("df").asc(), F.col("tok").asc())
    # persist: ranked feeds BOTH the prefix and the full-postings side
    # of the candidate join — without the barrier the df-join + window
    # rank runs twice (and AQE can't reuse the exchange across subtrees)
    ranked = (
        post.join(tok_df, "tok").withColumn("rk", F.row_number().over(w)).persist()
    )

    # prefix length |A| - ceil(t*|A|) + 1 (eps guards the float product)
    pref_len = F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz") - _EPS) + 1
    prefix = ranked.filter(F.col("rk") <= pref_len).select(
        F.col("id").alias("id_a"),
        F.col("sz").alias("sz_a"),
        F.col("rk").alias("rk_a"),
        "tok",
    )
    full = ranked.select(
        F.col("id").alias("id_b"),
        F.col("sz").alias("sz_b"),
        F.col("rk").alias("rk_b"),
        "tok",
    )
    return sh, prefix, full


def jaccard_similarity_join(
    docs: DataFrame,
    threshold: float,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """All (id_a < id_b, jaccard) pairs with exact n-gram Jaccard ≥
    threshold. Exact: returns the identical row set to the quadratic
    self-join over non-NULL-text documents (the DuckDB oracle runs
    that form). NULL-text documents are excluded up front: they have
    no content to be similar on, and their [NULL] shingle arrays would
    silently vanish at the token equi-joins while the quadratic
    baseline pairs them at jaccard 1.0 — excluding them keeps the
    exactness contract honest instead of data-dependent."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    sh, prefix, full = _ranked_postings(
        docs, threshold, id_col=id_col, text_col=text_col, shingles=shingles
    )

    # Minimum required overlap α = ⌈t/(1+t)·(|A|+|B|)⌉ (from
    # c ≥ t·(|A|+|B|−c)). The PPJoin positional filter: for the FIRST
    # common token (positions rk_a, rk_b in the global order) every
    # other common token ranks later in both docs, so overlap ≤
    # 1 + min(|A|−rk_a, |B|−rk_b); a qualifying pair always has a
    # matched row passing this bound, so filtering per-row before the
    # distinct is lossless while pruning most one-off collisions.
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("sz_a") + F.col("sz_b")) - _EPS
    )
    ubound = 1 + F.least(
        F.col("sz_a") - F.col("rk_a"), F.col("sz_b") - F.col("rk_b")
    )
    cands = (
        prefix.join(full, "tok")
        .filter(F.col("id_a") < F.col("id_b"))
        # length filter: jaccard >= t forces t*|A| <= |B| and t*|B| <= |A|
        .filter(
            (F.col("sz_b") >= F.lit(threshold) * F.col("sz_a") - _EPS)
            & (F.col("sz_a") >= F.lit(threshold) * F.col("sz_b") - _EPS)
        )
        .filter(ubound >= alpha)
        .select("id_a", "id_b")
        .distinct()
    )

    # Verify with overlap-only arithmetic: |A∪B| = |A|+|B|−|A∩B| (the
    # shingle arrays are distinct), saving the array_distinct(concat)
    # pass of the generic jaccard_column — identical integers, hence
    # identical rounded doubles, hence oracle-hash-identical.
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        cands.join(
            sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")),
            "id_a",
        )
        .join(
            sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")),
            "id_b",
        )
        .withColumn("_c", inter)
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("_c").cast("double")
                / (F.size("sh_a") + F.size("sh_b") - F.col("_c")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_similarity_join(
    docs: DataFrame,
    threshold: float,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """All ordered (id_a != id_b, containment) pairs with exact n-gram
    containment C(A in B) = |sh(A) ∩ sh(B)| / |sh(A)| ≥ threshold.

    Containment is the ASYMMETRIC near-dup question Jaccard cannot ask:
    a short document quoted wholesale inside a long one has containment
    ≈ 1.0 but Jaccard ≈ |A|/|B| — invisible to any symmetric threshold.
    It is the signal for sub-document duplication (quotes, mirrored
    articles with added boilerplate, prepended headers), the case the
    reference's equality dedup (EnrichmentApp.java:142-156) and our
    Jaccard join both miss.

    Same prefix-filter machinery as jaccard_similarity_join, one-sided:
    if |A∩B| ≥ t·|A| then A's rarest-first prefix of length
    |A| − ⌈t·|A|⌉ + 1 must contain a common shingle (else all common
    shingles fit in the last ⌈t·|A|⌉ − 1 slots — fewer than t·|A|).
    So PREFIX postings of the contained side join FULL postings of the
    container side — every qualifying ordered pair is caught, exactly.
    Extra pruning: |B| ≥ |A∩B| ≥ t·|A| (size filter), and the PPJoin
    positional bound c ≤ 1 + min(|A|−rk_a, |B|−rk_b) for the first
    common token under the shared global order.

    Scale shape identical to the Jaccard join: all joins move (id,
    token) pairs, never document bodies; hot shingles sort out of
    prefixes; exact verify touches candidates only. Oracle = the
    quadratic ordered self-join (tests + driver gate).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    sh, prefix, full = _ranked_postings(
        docs, threshold, id_col=id_col, text_col=text_col, shingles=shingles
    )

    need = F.ceil(F.lit(threshold) * F.col("sz_a") - _EPS)
    ubound = 1 + F.least(
        F.col("sz_a") - F.col("rk_a"), F.col("sz_b") - F.col("rk_b")
    )
    cands = (
        prefix.join(full, "tok")
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(F.col("sz_b") >= F.lit(threshold) * F.col("sz_a") - _EPS)
        .filter(ubound >= need)
        .select("id_a", "id_b")
        .distinct()
    )

    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        cands.join(
            sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")),
            "id_a",
        )
        .join(
            sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")),
            "id_b",
        )
        .withColumn("_c", inter)
        .select(
            "id_a",
            "id_b",
            F.round(F.col("_c").cast("double") / F.size("sh_a"), 6).alias(
                "containment"
            ),
        )
        .filter(F.col("containment") >= threshold)
    )
