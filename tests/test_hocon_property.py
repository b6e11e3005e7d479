"""Property-based HOCON-subset parser tests: generated config trees
round-trip through rendering + parsing, whatever the nesting, key
style, value type, comment placement, or dotted-path aliasing.
(Spark-free — pure Python, so hypothesis can run hundreds of cases.)"""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_application_spark.hocon import (
    hocon_get,
    parse_duration_ms,
    parse_hocon,
    parse_size,
)

_key = st.from_regex(r"[A-Za-z][A-Za-z0-9_\-]{0,8}", fullmatch=True)
_scalar = st.one_of(
    st.integers(min_value=-(10**12), max_value=10**12),
    st.booleans(),
    # quoted strings: printable, no quotes/backslashes/newlines/${
    st.from_regex(r"[A-Za-z0-9 .:/,@+-]{0,20}", fullmatch=True),
)


def _tree(depth: int):
    if depth == 0:
        return st.dictionaries(_key, _scalar, min_size=0, max_size=4)
    return st.dictionaries(
        _key,
        st.one_of(
            _scalar,
            st.lists(_scalar, max_size=3),
            st.deferred(lambda: _tree(depth - 1)),
        ),
        min_size=0,
        max_size=4,
    )


def _render_value(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return f'"{v}"'
    if isinstance(v, list):
        return "[" + ", ".join(_render_value(x) for x in v) + "]"
    raise TypeError(type(v))


def _render(tree: dict, indent: int = 0, sep_choice: int = 0) -> str:
    pad = "  " * indent
    out = []
    for i, (k, v) in enumerate(tree.items()):
        sep = " = " if (i + sep_choice) % 2 == 0 else " : "
        if isinstance(v, dict):
            opener = f"{pad}{k} {{" if (i + sep_choice) % 2 else f"{pad}{k} = {{"
            out.append(opener)
            out.append(_render(v, indent + 1, sep_choice + i))
            out.append(pad + "}")
        else:
            comment = "  # trailing" if (i + sep_choice) % 3 == 0 else ""
            out.append(f"{pad}{k}{sep}{_render_value(v)}{comment}")
    return "\n".join(x for x in out if x != "")


def _norm(v):
    # bare-word strings come back as strings; ints/bools typed
    return v


@settings(max_examples=200, deadline=None)
@given(_tree(2), st.integers(0, 1))
def test_roundtrip(tree, sep_choice):
    text = "// header comment\n" + _render(tree, sep_choice=sep_choice)
    parsed = parse_hocon(text)

    def check(expect: dict, got: dict, path=""):
        for k, v in expect.items():
            assert k in got, (path, k, text)
            if isinstance(v, dict):
                assert isinstance(got[k], dict)
                check(v, got[k], path + "." + k)
            else:
                assert got[k] == _norm(v), (path, k, got[k], v)

    check(tree, parsed)


@settings(max_examples=100, deadline=None)
@given(_key, _key, _scalar)
def test_dotted_key_equals_nested(outer, inner, value):
    """`a.b = v` must mean exactly what `a { b = v }` means."""
    flat = parse_hocon(f"{outer}.{inner} = {_render_value(value)}")
    nested = parse_hocon(f"{outer} = {{\n  {inner} = {_render_value(value)}\n}}")
    assert flat == nested
    assert hocon_get(flat, f"{outer}.{inner}") == _norm(value)


def test_substitution_rejected():
    with pytest.raises(ValueError):
        parse_hocon("a = ${b}")


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 10**6), st.sampled_from(["", "b", "kb", "MB", "gb"]))
def test_parse_size_units(n, unit):
    mult = {"": 1, "b": 1, "kb": 1024, "MB": 1024**2, "gb": 1024**3}[unit]
    assert parse_size(f"{n}{unit}") == n * mult


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 10**6), st.sampled_from(["", "ms", "s", "m", "h", "d"]))
def test_parse_duration_units(n, unit):
    mult = {"": 1, "ms": 1, "s": 1000, "m": 60000, "h": 3600000, "d": 86400000}[
        unit
    ]
    assert parse_duration_ms(f"{n}{unit}") == n * mult


def test_inline_object_one_liner():
    """`key = { a = 1, b = "x, y" }` — the inline form the generated
    round-trip never emits; commas inside quotes must not split."""
    parsed = parse_hocon('kafka = { topic = "t, v2", retries = 3, on = true }')
    assert parsed == {
        "kafka": {"topic": "t, v2", "retries": 3, "on": True}
    }
    nested = parse_hocon('a = { b.c = 1, d = [1, 2] }')
    assert nested == {"a": {"b": {"c": 1}, "d": [1, 2]}}
