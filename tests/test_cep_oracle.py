"""The CEP recursive-CTE oracles (plans/cep_queries.py) must replay
the automaton core exactly — greedy earliest non-overlapping matching,
horizon rewind, Kleene-greedy absorption, and notFollowedBy kills.

No Spark needed: the property drives `operators/cep.greedy_scan` /
`greedy_scan_quant` (the SAME functions match_pattern executes inside
applyInPandas) and DuckDB side by side over randomized event streams.
The driver's gate then re-proves the full Spark path at sf0.01."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import datetime

import duckdb

from flink_application_spark.operators.cep import greedy_scan, greedy_scan_quant
from flink_application_spark.plans import cep_queries as cq

TYPES = ["signup", "click", "purchase", "error", "view"]


def _py_matches(rows, steps, w_seconds, quants=None, guards_pred=None):
    by_u: dict = {}
    for u, eid, ts, et in rows:
        by_u.setdefault(u, []).append((ts, eid, et))
    out = []
    for u, evs in by_u.items():
        evs.sort()  # (ts, event_id) — the operator's total order
        ts_us = [int(ts.timestamp() * 1e6) for ts, _, _ in evs]
        flags = [[et == s for _, _, et in evs] for s in steps]
        if quants is None:
            ms, _, _ = greedy_scan(
                ts_us, flags, len(steps), w_seconds * 1_000_000, [], 0, len(evs)
            )
            for m in ms:
                out.append(
                    tuple([u] + [evs[p][0] for p in m] + [evs[p][1] for p in m])
                )
        else:
            g = None
            if guards_pred:
                g = [
                    [et == gp for _, _, et in evs] if gp else None
                    for gp in guards_pred
                ]
            ms, _, _ = greedy_scan_quant(
                ts_us, flags, quants, w_seconds * 1_000_000, [], 0, len(evs),
                guards=g,
            )
            for m in ms:
                out.append(
                    tuple(
                        [u]
                        + [evs[ps[0]][0] for ps in m]
                        + [evs[ps[0]][1] for ps in m]
                        + [len(ps) for ps in m]
                    )
                )
    return sorted(out)


def _sql_matches(rows, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (user_id BIGINT, event_id BIGINT,"
        " ts TIMESTAMP, event_type VARCHAR)"
    )
    if rows:
        con.executemany("INSERT INTO events VALUES (?,?,?,?)", rows)
    return sorted(tuple(r) for r in con.sql(sql).fetchall())


def test_cep_oracles_replay_the_automaton_exactly():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(1, 5),          # user
                st.integers(0, 50_000),     # gap seconds (0 → ts ties)
                st.integers(0, len(TYPES) - 1),
            ),
            min_size=0,
            max_size=60,
        )
    )
    def run(spec):
        rows, eid, cursor = [], 0, {}
        for u, gap, ti in spec:
            t = cursor.get(u, 0) + gap
            cursor[u] = t
            rows.append(
                (
                    u,
                    eid,
                    datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=t),
                    TYPES[ti],
                )
            )
            eid += 1
        assert _py_matches(rows, ["signup", "click", "purchase"], 86400) == (
            _sql_matches(rows, cq._FUNNEL_ORACLE)
        )
        assert _py_matches(
            rows, ["error", "purchase"], 86400, quants=["oneOrMore", "once"]
        ) == _sql_matches(rows, cq._BURST_ORACLE)
        assert _py_matches(
            rows,
            ["signup", "purchase"],
            3600,
            quants=["once", "once"],
            guards_pred=["error"],
        ) == _sql_matches(rows, cq._CHECKOUT_ORACLE)

    run()
