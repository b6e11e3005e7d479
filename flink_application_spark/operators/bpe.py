"""Byte-pair-encoding vocabulary learning (Sennrich et al. 2016,
arXiv:1508.07909) — the tokenizer-training step of an LLM data
pipeline, expressed Spark-first.

The scale insight that makes BPE training cheap at 100 TB: after ONE
corpus pass builds the word-frequency table, every merge iteration
runs on that table — whose size is the VOCABULARY (unique words), not
the corpus. The driver loop is:

1. ``word_symbol_counts`` — one corpus-wide token hash-agg (map-side
   combinable; the only pass that sees every row) producing
   (word, count, symbols[]), seeded with character symbols plus the
   ``</w>`` end-of-word marker.
2. per merge round: ``pair_counts`` (scan-local adjacent-pair
   transform + hash agg over vocab-sized input), driver-side top-1
   (count desc, then lexicographic pair — fully deterministic, no
   RNG), then ``apply_merge`` — a scan-local sequential fold that
   rewrites each symbol array left-to-right.

The left-to-right fold in ``apply_merge`` is exactly the classic
non-overlapping greedy merge: once a pair merges, the accumulator's
tail becomes ``left+right`` which can never equal ``left`` again (a
string strictly grew), so overlapping re-merges are impossible —
"aaa" under merge (a,a) yields [aa, a], matching the reference
algorithm.

``localCheckpoint`` truncates lineage every few rounds the same way
the connected-components loop does — without it the plan doubles per
iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flink_application_spark.functions.text import tokens

END = "</w>"


def word_symbol_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, c, syms): corpus word frequencies with initial
    character-level symbol arrays (+ ``</w>`` terminal symbol)."""
    words = (
        docs.select(
            F.explode(F.filter(tokens(F.col(text_col)), lambda t: t != "")).alias(
                "word"
            )
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return words.select(
        "word",
        "c",
        F.concat(F.split("word", ""), F.array(F.lit(END))).alias("syms"),
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """(left, right, n_pairs): adjacent-symbol pair totals weighted by
    word frequency. Scan-local pair construction (no self-join on
    position), vocab-sized hash aggregate."""
    pairs = words.select(
        "c",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("syms"), i).alias("lhs"),
                    F.element_at(F.col("syms"), i + 1).alias("rhs"),
                ),
            )
        ).alias("p"),
    ).filter(F.size("syms") >= 2)
    return pairs.groupBy("p.lhs", "p.rhs").agg(F.sum("c").alias("n_pairs"))


def apply_merge(words: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every symbol array, merging left-to-right non-overlapping
    occurrences of (left, right) into one symbol ``left+right``."""
    merged = left + right
    new_syms = F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, cur: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (cur == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(cur))),
    )
    return words.select("word", "c", new_syms.alias("syms"))


def bpe_learn(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` merge rules. Returns [(left, right, count)]
    in merge order. Ties break lexicographically on (left, right) —
    deterministic across partitionings and engines."""
    words = word_symbol_counts(docs, text_col).localCheckpoint()
    rules: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        top = (
            pair_counts(words)
            .orderBy(F.col("n_pairs").desc(), F.col("lhs"), F.col("rhs"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, n = top[0]["lhs"], top[0]["rhs"], int(top[0]["n_pairs"])
        rules.append((left, right, n))
        words = apply_merge(words, left, right)
        # truncate lineage every round: each apply_merge nests another
        # HOF fold; 10 stacked folds is fine to execute but the plan
        # (and closure cleaning) grows quadratically without a cut
        words = words.localCheckpoint()
    return rules


def bpe_oracle_sql(n_merges: int, mode: str = "merges") -> str:
    """DuckDB replay of the ENTIRE merge-learning loop (the round-8
    rows-only → oracle-EXACT conversion): the merge count is a fixed
    constant, so the loop unrolls as MATERIALIZED CTE stages — one
    (pair-count, top-1, rewrite) triple per round, the mmr_sql/
    kmeans_exact unrolling recipe applied to tokenizer training.

    The per-round rewrite is STRING SURGERY standing in for the
    scan-local list fold: symbol arrays encode as
    ``\\x01sym\\x02\\x01sym\\x02…`` (each symbol individually wrapped,
    so arbitrary symbol strings stay unambiguous), and one
    ``replace(enc, \\x01l\\x02\\x01r\\x02, \\x01lr\\x02)`` applies the
    merge: standard replace scans left-to-right and resumes AFTER each
    replacement, which is exactly the greedy non-overlapping fold
    ("aaa" → [aa, a], "aaaa" → [aa, aa] — probed, and pinned against
    the pure-Python reference in tests/test_bpe.py). Precondition
    (asserted by test_bpe_oracle_delimiter_precondition): the corpus
    contains no \\x01/\\x02 control characters — true of the driver
    fixtures; the SPARK side (`apply_merge`) needs no such guard.

    mode='merges' → (merge_idx, lhs, rhs, n_pairs) per learned rule;
    mode='tokens' → per-document BPE token counts under the final
                    segmentation (doc_id, n_words, n_bpe_tokens).
    """
    parts = [
        """words AS MATERIALIZED (
  SELECT w.word AS word, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(list_filter(
          regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t <> '')) AS word
        FROM documents) w
  GROUP BY w.word
)""",
        """e0 AS MATERIALIZED (
  SELECT word, c,
         array_to_string(list_transform(list_append(string_split(word, ''), '</w>'),
                                        s -> chr(1) || s || chr(2)), '') AS enc
  FROM words
)""",
    ]
    for t in range(1, n_merges + 1):
        parts.append(
            f"""p{t} AS (
  SELECT s[i] AS lhs, s[i + 1] AS rhs, CAST(sum(c) AS BIGINT) AS n_pairs
  FROM (SELECT c, s, unnest(generate_series(1, len(s) - 1)) AS i
        FROM (SELECT c, string_split(substr(enc, 2, length(enc) - 2),
                                     chr(2) || chr(1)) AS s
              FROM e{t - 1})
        WHERE len(s) >= 2)
  GROUP BY lhs, rhs
)"""
        )
        parts.append(
            f"""t{t} AS MATERIALIZED (
  SELECT lhs, rhs, n_pairs FROM p{t} ORDER BY n_pairs DESC, lhs, rhs LIMIT 1
)"""
        )
        # LEFT JOIN ON TRUE + COALESCE, not CROSS JOIN: when a round
        # has no remaining pairs (t{t} empty — merges exhausted before
        # n_merges) the rewrite must be a NO-OP, matching bpe_learn's
        # early break. A CROSS JOIN against the empty t{t} would wipe
        # the vocabulary and zero mode='tokens' on degenerate corpora
        # (round-8 ADVICE; exhaustion-edge parity pinned in
        # tests/test_bpe.py).
        parts.append(
            f"""e{t} AS MATERIALIZED (
  SELECT e.word, e.c,
         COALESCE(replace(e.enc,
                          chr(1) || t.lhs || chr(2) || chr(1) || t.rhs || chr(2),
                          chr(1) || t.lhs || t.rhs || chr(2)),
                  e.enc) AS enc
  FROM e{t - 1} e LEFT JOIN t{t} t ON TRUE
)"""
        )
    body = ",\n".join(parts)
    if mode == "merges":
        rows = "\nUNION ALL\n".join(
            f"SELECT CAST({t - 1} AS INT) AS merge_idx, lhs, rhs, n_pairs FROM t{t}"
            for t in range(1, n_merges + 1)
        )
        return f"WITH {body}\nSELECT merge_idx, lhs, rhs, n_pairs FROM ({rows})"
    assert mode == "tokens"
    return f"""WITH {body},
vocab AS (SELECT word,
                 CAST(length(enc) - length(replace(enc, chr(1), '')) AS INT) AS n_sym
          FROM e{n_merges}),
docw AS (SELECT doc_id, unnest(list_filter(
           regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t <> '')) AS word
         FROM documents)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens
FROM docw JOIN vocab USING (word) GROUP BY doc_id"""


def bpe_segment(words: DataFrame, rules: list[tuple[str, str, int]]) -> DataFrame:
    """Apply learned rules in order to segment the vocabulary:
    (word, c, syms, n_sym). The application is the same scan-local
    fold as training — encoding a NEW corpus is one narrow pass."""
    for left, right, _ in rules:
        words = apply_merge(words, left, right)
    return words.withColumn("n_sym", F.size("syms"))
