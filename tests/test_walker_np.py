"""Differential tests: the vectorized NumPy walker (walker_np) must be
byte-exact vs the pure-Python oracle on every input — including the
walker-only quirk lines (atol sign/whitespace acceptance, zero rule),
unicode bail-outs, nulls, and trailing-optional endings."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from logparser_spark.functions.formats import DEFAULT_FORMAT, compile_format
from logparser_spark.functions.oracle import parse_line
from logparser_spark.operators.walker_np import batch_walk_arrow
from logparser_spark.sources.corpus import GOLDEN_LINES

QUIRK_LINES = [
    "",
    "0322",
    "0322 085338",
    "0322 085338 TRACE  :",
    "-5 17 X :.a: b",        # atol sign, zero consumption
    " 42 7 L :.s: m",        # atol whitespace skip
    "00 0 A :.b: c",         # zero value with '0' at cursor
    "+3 9 Q :.z: w",         # plus sign
    "0" * 25 + " 5 T :.q: r",  # >18 digits -> overflow bail
    "üñï 1 X :.a: b",        # non-ASCII -> unicode bail
    "0322 085338 TRÄCE  :.a: b",
]

SPECS = [
    DEFAULT_FORMAT,
    "{STR:A,4}:{CHR:,-,1}{INT:N}",
    "{INT:A} {STR:B}",
    "{STR:K}={STR:V}",
    "[{INT:T}] {STR:L} {STR:R}",
    "{STR:A} {STR:B}",
    "{INT:A}x{STR:B}",
    "{DATE:D} {STR:Rest}",
    "{INT:N} {DATE:D}",
]


def _fuzz_lines(seed=11, n=2000):
    rng = random.Random(seed)
    alph = list("0123456789abcXY.:-= \t")
    out = list(GOLDEN_LINES) + QUIRK_LINES + [None]
    for _ in range(n):
        base = list(rng.choice(GOLDEN_LINES))
        for _ in range(rng.randint(0, 5)):
            op = rng.randint(0, 2)
            pos = rng.randrange(len(base)) if base else 0
            if op == 0 and base:
                base[pos] = rng.choice(alph)
            elif op == 1 and base:
                del base[pos]
            else:
                base.insert(pos, rng.choice(alph))
        out.append("".join(base))
    for _ in range(500):
        out.append("".join(rng.choice(alph)
                           for _ in range(rng.randint(0, 30))))
    # date-shaped lines: calendar edges, bad months/days, year 0000,
    # wrong separators, truncation
    for _ in range(800):
        y = rng.choice(["2024", "2023", "1900", "2000", "0000", "9999",
                        str(rng.randint(0, 9999)).zfill(4)])
        m = str(rng.randint(0, 19)).zfill(2)
        d = str(rng.randint(0, 39)).zfill(2)
        sep = rng.choice(["-", "-", "-", "/", ""])
        tail = "".join(rng.choice(alph) for _ in range(rng.randint(0, 10)))
        out.append(f"{y}{sep}{m}{sep}{d}{tail}")
        out.append(f"7 {y}-{m}-{d}")
    return out


@pytest.mark.parametrize("fmt", SPECS)
def test_np_walker_equals_oracle(fmt):
    spec = compile_format(fmt)
    lines = _fuzz_lines()
    arr = pa.array(lines, pa.string())
    outs, wf = batch_walk_arrow(arr, spec)
    ncols = len(spec.output_fields())
    for r, line in enumerate(lines):
        if line is None:
            exp_v, exp_w = [None] * ncols, False
        else:
            exp_v, exp_w = parse_line(line, spec)
        got = [outs[k][r].as_py() for k in range(ncols)]
        assert wf[r].as_py() == exp_w, (fmt, line)
        assert got == list(exp_v), (fmt, line, got, exp_v)


def test_np_walker_sliced_input():
    """Arrow slices carry a non-zero offset; the buffer math must hold."""
    spec = compile_format(DEFAULT_FORMAT)
    lines = _fuzz_lines(seed=5, n=300)
    arr = pa.array(lines, pa.string()).slice(37, 200)
    outs, wf = batch_walk_arrow(arr, spec)
    ncols = len(spec.output_fields())
    for r, line in enumerate(arr.to_pylist()):
        if line is None:
            exp_v, exp_w = [None] * ncols, False
        else:
            exp_v, exp_w = parse_line(line, spec)
        got = [outs[k][r].as_py() for k in range(ncols)]
        assert wf[r].as_py() == exp_w and got == list(exp_v), (r, line)


def test_np_walker_int_saturation_contract():
    """>18-digit runs bail to the oracle, which saturates at int64
    bounds (C strtol) — the walker must neither raise nor diverge."""
    from logparser_spark.functions.oracle import INT64_MAX, INT64_MIN

    spec = compile_format("{INT:X} {STR:Rest}")
    lines = [
        "9" * 19 + " a",
        "9" * 25 + " b",
        "9223372036854775807 in-range",
        "9223372036854775808 past-max",
        "0" * 30 + " zeros",
        "123 normal",
    ]
    arr = pa.array(lines, pa.string())
    outs, wf = batch_walk_arrow(arr, spec)
    ncols = len(spec.output_fields())
    for r, line in enumerate(lines):
        exp_v, exp_w = parse_line(line, spec)
        got = [outs[k][r].as_py() for k in range(ncols)]
        assert wf[r].as_py() == exp_w and got == list(exp_v), (line, got)
    assert outs[0][0].as_py() == INT64_MAX
    assert outs[0][4].as_py() == 0

    neg = compile_format("{INT:X}-{INT:Y}")
    arr2 = pa.array(["-" + "9" * 25], pa.string())
    outs2, wf2 = batch_walk_arrow(arr2, neg)
    assert wf2[0].as_py() is True
    assert outs2[0][0].as_py() == INT64_MIN
