"""Invariants of the concat-then-chunk sequence packer
(operators/packing.py) — the structural contracts the oracle hash
can't see on its own."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import pytest
from pyspark.sql import functions as F

from flink_application_spark.operators.packing import packed_spans, packing_stats

L = 64


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")


@pytest.fixture(scope="module")
def corpus(spark):
    # lengths chosen to exercise: doc == bin, doc > 2 bins, tiny docs,
    # a zero-token doc (must vanish), a NULL count (must vanish)
    return _docs(
        spark,
        [
            (1, 10),
            (2, L),
            (3, 3 * L + 7),
            (4, 1),
            (5, 0),
            (6, None),
            (7, 50),
        ],
    )


def test_per_doc_spans_reassemble_document(spark, corpus):
    spans = packed_spans(corpus, L)
    per_doc = {
        r.doc_id: sorted(
            (s.doc_offset, s.span_len)
            for s in spans.filter(F.col("doc_id") == r.doc_id).collect()
        )
        for r in corpus.filter(F.col("n_tokens") > 0).collect()
    }
    want = {r.doc_id: r.n_tokens for r in corpus.filter(F.col("n_tokens") > 0).collect()}
    assert set(per_doc) == set(want)
    for doc_id, pieces in per_doc.items():
        # contiguous from 0, summing to the document's token count
        pos = 0
        for off, ln in pieces:
            assert off == pos and ln > 0
            pos += ln
        assert pos == want[doc_id]


def test_bins_tile_without_gap_or_overlap(spark, corpus):
    spans = packed_spans(corpus, L).collect()
    total = sum(s.span_len for s in spans)
    by_bin: dict[int, list] = {}
    for s in spans:
        by_bin.setdefault(s.bin_id, []).append((s.bin_offset, s.span_len))
    n_bins = max(by_bin) + 1
    assert set(by_bin) == set(range(n_bins))  # no empty bin
    for b, pieces in by_bin.items():
        pos = 0
        for off, ln in sorted(pieces):
            assert off == pos, f"gap/overlap in bin {b}"
            pos += ln
        if b < n_bins - 1:
            assert pos == L  # interior bins are exactly full
        else:
            assert 0 < pos <= L  # final bin holds the remainder
    assert total == 10 + L + 3 * L + 7 + 1 + 50
    # zero/NULL-token docs occupy nothing
    assert {s.doc_id for s in spans} == {1, 2, 3, 4, 7}


def test_two_phase_equals_single_phase_and_partitioning_invariant(spark, corpus):
    a = sorted(tuple(r) for r in packed_spans(corpus, L, two_phase=True).collect())
    b = sorted(tuple(r) for r in packed_spans(corpus, L, two_phase=False).collect())
    assert a == b
    c = sorted(
        tuple(r)
        for r in packed_spans(corpus.repartition(7), L, two_phase=True).collect()
    )
    assert a == c


def test_offsets_broadcast_path_bit_equal(spark, corpus):
    """literal_max=0 forces the broadcast-join offset attach (the
    >LITERAL_BASE_MAX partition-count path) — bit-equal to the
    create_map literal path, BroadcastHashJoin in the plan."""
    from flink_application_spark.operators.packing import _with_offsets_two_phase

    docs = corpus.filter(F.col("n_tokens") > 0)
    a = sorted(
        tuple(r) for r in _with_offsets_two_phase(docs, "doc_id", "n_tokens").collect()
    )
    bj = _with_offsets_two_phase(docs, "doc_id", "n_tokens", literal_max=0)
    assert "BroadcastHashJoin" in bj._jdf.queryExecution().toString()
    assert sorted(tuple(r) for r in bj.collect()) == a


def test_stats_report(spark, corpus):
    spans = packed_spans(corpus, L)
    row = packing_stats(spans, L).collect()[0]
    total = 10 + L + 3 * L + 7 + 1 + 50
    import math

    assert row.total_tokens == total
    assert row.n_bins == math.ceil(total / L)
    assert row.n_docs == 5
    # doc 3 definitely crosses (3 bins); crossing count consistent
    per_doc = spans.groupBy("doc_id").count().collect()
    want_crossing = sum(1 for r in per_doc if r["count"] > 1)
    assert row.docs_crossing == want_crossing
    assert row.fill_ppm == (total * 1_000_000) // (row.n_bins * L)
    assert row.crossing_ppm == (want_crossing * 1_000_000) // 5


def test_seq_len_one_and_validation(spark):
    docs = _docs(spark, [(1, 3)])
    spans = packed_spans(docs, 1).collect()
    assert len(spans) == 3
    assert all(s.span_len == 1 for s in spans)
    with pytest.raises(ValueError):
        packed_spans(docs, 0)


def test_base_offset_associativity(spark):
    """packing([A; B]) == packing(A) ∪ packing(B at offset tokens(A))
    — the property the streaming packer's one-number cursor state
    relies on."""
    a_rows = [(1, 10), (2, L), (3, 3 * L + 7)]
    b_rows = [(4, 1), (6, 50), (7, 90)]
    whole = sorted(
        tuple(r) for r in packed_spans(_docs(spark, a_rows + b_rows), L).collect()
    )
    part_a = packed_spans(_docs(spark, a_rows), L)
    tok_a = sum(n for _, n in a_rows)
    part_b = packed_spans(_docs(spark, b_rows), L, base_offset=tok_a)
    split = sorted(tuple(r) for r in part_a.collect()) + sorted(
        tuple(r) for r in part_b.collect()
    )
    assert whole == sorted(split)


def test_packing_invariants_property(spark):
    """Hypothesis sweep: for arbitrary token-count multisets and seq
    lengths, a pure-Python reference packer agrees with packed_spans
    row for row, and the split-anywhere associativity holds."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(st.integers(0, 200), min_size=0, max_size=12),
        st.integers(1, 100),
        st.integers(0, 11),
    )
    def run(lengths, seq_len, split_at):
        rows = [(i + 1, n) for i, n in enumerate(lengths)]
        # python reference: concat in id order, cut every seq_len
        expect = []
        off = 0
        for doc_id, n in rows:
            if n <= 0:
                continue
            pos = 0
            while pos < n:
                b = (off + pos) // seq_len
                take = min(n - pos, (b + 1) * seq_len - (off + pos))
                expect.append(
                    (b, doc_id, pos, (off + pos) - b * seq_len, take)
                )
                pos += take
            off += n
        got = sorted(
            tuple(r) for r in packed_spans(_docs(spark, rows), seq_len).collect()
        )
        assert got == sorted(expect), (lengths, seq_len)
        # associativity at an arbitrary split point
        a, b = rows[:split_at], rows[split_at:]
        tok_a = sum(n for _, n in a if n > 0)
        joined = sorted(
            tuple(r) for r in packed_spans(_docs(spark, a), seq_len).collect()
        ) + sorted(
            tuple(r)
            for r in packed_spans(
                _docs(spark, b), seq_len, base_offset=tok_a
            ).collect()
        )
        assert sorted(joined) == got

    run()
