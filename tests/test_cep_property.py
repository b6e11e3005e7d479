"""Property tests for the CEP automaton core (`greedy_scan`) — pure
Python, no Spark session, so hypothesis can hammer it.

The `resume` property is the one the streaming operator's correctness
rests on: scanning a sequence in two chunks, carrying (bound, scanned)
across the cut and retaining the suffix from the partial's head,
yields exactly the one-shot scan's matches."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

from hypothesis import given, settings, strategies as st

from flink_application_spark.operators.cep import greedy_scan

K = 3


@st.composite
def events(draw):
    n = draw(st.integers(0, 40))
    ts, flags = [], [[] for _ in range(K)]
    t = 0
    for _ in range(n):
        t += draw(st.integers(0, 5))
        ts.append(t)
        for s in range(K):
            flags[s].append(draw(st.booleans()))
    return ts, flags


def _scan(ts, flags, within):
    return greedy_scan(ts, flags, K, within, [], 0, len(ts))


@settings(max_examples=300, deadline=None)
@given(events(), st.one_of(st.none(), st.integers(0, 12)))
def test_matches_are_valid_and_disjoint(ev, within):
    ts, flags = ev
    matches, bound, scanned = _scan(ts, flags, within)
    seen: set[int] = set()
    for m in matches:
        assert len(m) == K
        assert m == sorted(m)  # bound in order
        for step, pos in enumerate(m):
            assert flags[step][pos]  # predicate holds at each binding
            assert pos not in seen  # non-overlapping
            seen.add(pos)
        if within is not None:
            assert ts[m[-1]] - ts[m[0]] <= within
    assert scanned == len(ts)
    # any open partial is also valid and disjoint from matches
    for step, pos in enumerate(bound):
        assert flags[step][pos] and pos not in seen


@settings(max_examples=300, deadline=None)
@given(events(), st.one_of(st.none(), st.integers(0, 12)), st.data())
def test_resume_across_cut_equals_one_shot(ev, within, data):
    ts, flags = ev
    want, _, _ = _scan(ts, flags, within)

    cut = data.draw(st.integers(0, len(ts)))
    # chunk 1: scan the prefix
    m1, bound, scanned = greedy_scan(ts, flags, K, within, [], 0, cut)
    # retention: everything from the open partial's head (or the cut)
    keep_from = bound[0] if bound else scanned
    ts2 = ts[keep_from:]
    flags2 = [f[keep_from:] for f in flags]
    bound2 = [b - keep_from for b in bound]
    scanned2 = scanned - keep_from
    # chunk 2: resume over retained + remainder
    m2, _, _ = greedy_scan(ts2, flags2, K, within, bound2, scanned2, len(ts2))

    got = [m for m in m1] + [[p + keep_from for p in m] for m in m2]
    assert got == want


@settings(max_examples=300, deadline=None)
@given(events(), st.one_of(st.none(), st.integers(0, 12)))
def test_quantified_all_once_equals_plain(ev, within):
    from flink_application_spark.operators.cep import greedy_scan_quant

    ts, flags = ev
    plain, _, _ = _scan(ts, flags, within)
    quant, _, _ = greedy_scan_quant(ts, flags, ["once"] * K, within, [], 0, len(ts))
    assert [[p[0] for p in m] for m in quant] == plain
    assert all(len(p) == 1 for m in quant for p in m)


@settings(max_examples=300, deadline=None)
@given(events(), st.one_of(st.none(), st.integers(0, 12)))
def test_quantified_matches_valid_and_disjoint(ev, within):
    from flink_application_spark.operators.cep import greedy_scan_quant

    ts, flags = ev
    quants = ["once", "oneOrMore", "once"]
    seen: set[int] = set()
    q_matches, _, _ = greedy_scan_quant(ts, flags, quants, within, [], 0, len(ts))
    for m in q_matches:
        assert len(m) == K
        flat = [p for b in m for p in b]
        assert flat == sorted(flat)
        for step, positions in enumerate(m):
            assert len(positions) >= 1
            if quants[step] == "once":
                assert len(positions) == 1
            for pos in positions:
                assert flags[step][pos]
                assert pos not in seen
                seen.add(pos)
        if within is not None:
            assert ts[flat[-1]] - ts[flat[0]] <= within


@settings(max_examples=300, deadline=None)
@given(events(), st.one_of(st.none(), st.integers(0, 12)), st.data())
def test_guarded_matches_have_clean_gaps(ev, within, data):
    """No guard-matching event may lie strictly between the bindings
    of consecutive steps inside any emitted match."""
    from flink_application_spark.operators.cep import greedy_scan_quant

    ts, flags = ev
    n = len(ts)
    guards = [
        [data.draw(st.booleans()) for _ in range(n)] if g else None
        for g in (data.draw(st.booleans()), data.draw(st.booleans()))
    ]
    q_matches, _, _ = greedy_scan_quant(
        ts, flags, ["once"] * K, within, [], 0, n, guards=guards
    )
    for m in q_matches:
        for j in range(K - 1):
            if guards[j] is None:
                continue
            lo, hi = m[j][-1], m[j + 1][0]
            for pos in range(lo + 1, hi):
                # a guard event here would have killed the partial —
                # unless that same event advanced the pattern (bound)
                bound_positions = {p for b in m for p in b}
                assert not guards[j][pos] or pos in bound_positions


@settings(max_examples=300, deadline=None)
@given(events(), st.one_of(st.none(), st.integers(0, 12)), st.data())
def test_quant_resume_across_cut_equals_one_shot(ev, within, data):
    """The quantified core is resumable under the same retention
    contract as the plain one: retain from the open partial's head,
    pass (bound, scanned) back in — union of emissions equals the
    one-shot scan (the invariant streaming CEP quantifiers rest on)."""
    from flink_application_spark.operators.cep import greedy_scan_quant

    ts, flags = ev
    n = len(ts)
    quants = data.draw(
        st.tuples(
            st.sampled_from(["once", "oneOrMore"]),
            st.sampled_from(["once", "oneOrMore"]),
        )
    )
    quants = [quants[0], quants[1], "once"]
    guards = [
        [data.draw(st.booleans()) for _ in range(n)] if g else None
        for g in (data.draw(st.booleans()), data.draw(st.booleans()))
    ]
    want, _, _ = greedy_scan_quant(ts, flags, quants, within, [], 0, n, guards=guards)

    cut = data.draw(st.integers(0, n))
    m1, bound, scanned = greedy_scan_quant(
        ts, flags, quants, within, [], 0, cut, guards=guards
    )
    keep_from = bound[0][0] if bound else scanned
    ts2 = ts[keep_from:]
    flags2 = [f[keep_from:] for f in flags]
    guards2 = [g[keep_from:] if g is not None else None for g in guards]
    bound2 = [[p - keep_from for p in b] for b in bound]
    m2, _, _ = greedy_scan_quant(
        ts2, flags2, quants, within, bound2, scanned - keep_from, len(ts2),
        guards=guards2,
    )

    got = list(m1) + [
        [[p + keep_from for p in b] for b in m] for m in m2
    ]
    assert got == want
