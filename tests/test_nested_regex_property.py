"""Property-based differential test: the nested-possessive regex tier
(FormatSpec.to_regex — the pandas fallback path) must agree with the
byte-exact oracle walker wherever it MATCHES. Rows it rejects go to the
walker by construction, so one-sided agreement is the safety property.

Uses hypothesis to generate random format specs (from the real grammar)
and adversarial lines (random + near-matching mutations).
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from logparser_spark.functions.formats import (
    FieldType,
    compile_format,
)
from logparser_spark.functions.oracle import parse_line

# ── spec generator (valid grammar strings, no DBL: the DBL fast/regex
#    tiers route through value-level suspicion checks tested elsewhere) ──

_name = st.sampled_from(["A", "B", "Val", "X1", ""])
_chr_target = st.sampled_from([".", ":", "-", "=", "x"])

_field = st.one_of(
    _name.map(lambda n: f"{{INT:{n}}}"),
    _name.map(lambda n: f"{{STR:{n}}}"),
    st.tuples(_name, st.integers(0, 5)).map(
        lambda t: f"{{STR:{t[0]},{t[1]}}}"
    ),
    st.tuples(_name, _chr_target, st.sampled_from(["0", "1"])).map(
        lambda t: f"{{CHR:{t[0]},{t[1]},{t[2]}}}"
    ),
    st.sampled_from([" ", ":", "=", "-", "["]),
)

_spec_str = st.lists(_field, min_size=1, max_size=6).map("".join)

_line_alphabet = "0123456789abcXY.:-= \t"
_random_line = st.text(alphabet=_line_alphabet, min_size=0, max_size=40)


def _nested_values(spec, pattern, line):
    m = pattern.match(line)
    if m is None:
        return None
    gd = m.groupdict()
    if gd.get("wf0") is None:
        return None
    vals = []
    for i, f in spec.output_fields():
        g = gd.get(f"g{i}")
        if g is None:
            vals.append(None)
        elif f.ftype == FieldType.INT:
            vals.append(int(g))
        else:
            vals.append(g)
    return vals


@settings(max_examples=400, deadline=None)
@given(fmt=_spec_str, line=_random_line)
def test_nested_regex_matches_imply_walker_agreement(fmt, line):
    try:
        spec = compile_format(fmt)
    except ValueError:
        return  # invalid spec strings are rejected at compile time
    pattern = re.compile(spec.to_regex())
    nested = _nested_values(spec, pattern, line)
    if nested is None:
        return  # regex-rejected rows go to the walker by construction
    vals, wf = parse_line(line, spec)
    assert wf, f"regex matched but walker malformed: {fmt!r} {line!r}"
    assert nested == list(vals), (
        f"value mismatch: {fmt!r} {line!r} regex={nested} walker={list(vals)}"
    )


@settings(max_examples=200, deadline=None)
@given(fmt=_spec_str)
def test_compile_is_deterministic_and_regex_wellformed(fmt):
    try:
        s1 = compile_format(fmt)
        s2 = compile_format(fmt)
    except ValueError:
        return
    assert [f.__dict__ for f in s1.fields] == [f.__dict__ for f in s2.fields]
    re.compile(s1.to_regex())  # must always be a valid pattern
    fast = s1.to_fast_regex()
    if fast is not None:
        re.compile(fast)


@settings(max_examples=300, deadline=None)
@given(line=_random_line, seed=st.integers(0, 2**31))
def test_default_format_nested_vs_walker_on_mutations(line, seed):
    import random as _r

    from logparser_spark.sources.corpus import GOLDEN_LINES

    rng = _r.Random(seed)
    base = list(rng.choice(GOLDEN_LINES))
    pos = rng.randrange(len(base))
    base[pos:pos] = line[:5]
    mutated = "".join(base)

    spec = compile_format(
        "{INT:Date} {INT:Time} {STR:Level} :{CHR:,.,1}{STR:Source}: {STR:Mesg}"
    )
    pattern = re.compile(spec.to_regex())
    nested = _nested_values(spec, pattern, mutated)
    if nested is None:
        return
    vals, wf = parse_line(mutated, spec)
    assert wf and nested == list(vals)
