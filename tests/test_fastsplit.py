"""Differential tests for the capture-free split-plan kernel
(operators/fastsplit.py): wherever the plan accepts a row, its children
must equal the extract_regex kernel's — which test_fast_regex.py in
turn proves equal to the reference walker. Rows the alignment checks
reject must merely be VALID=False (routed to the walker), never
silently wrong. Pure-Arrow tests, no JVM."""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from logparser_spark.functions.formats import (
    DEFAULT_FORMAT,
    FieldType,
    compile_format,
)
from logparser_spark.functions.oracle import parse_line
from logparser_spark.operators.fastsplit import (
    compile_any_split_plan,
    compile_seq_plan,
    compile_split_plan,
)
from logparser_spark.operators.parse import _fast_plan
from logparser_spark.sources.corpus import GOLDEN_LINES

PLAN_SPECS = [
    DEFAULT_FORMAT,                       # tokens + anchor + ws tail
    "{INT:A} {INT:B} {INT:C}",            # tokens only
    "{STR:A} {STR:B}",                    # ANY_WS tokens
    "{INT:A} {STR:B} {STR:Rest}",         # hmm: Rest is EOL tail
    "{STR:Lvl} :{STR:Src}: {STR:Mesg}",   # 1 token + anchor + tail
    ":{STR:Src}: {STR:Mesg}",             # anchor at start
]

NO_PLAN_SPECS = [
    "{STR:Tag,4}:{CHR:,-,1}{INT:Num}",    # NCHAR -> outside the family
    "{DBL:X} {STR:R}",                    # DBL -> no fast regex at all
    "{INT:A}x{STR:B}",                    # delimiter without WS separator
]

ADVERSARIAL = [
    # anchor char inside tokens (misalignment traps)
    "0322 085338 TR:CE  :...src: mesg",
    "0322 085338 :TRACE :...src: mesg",
    "0:22 085338 TRACE  :...src: mesg",
    "0322 08:338 TRACE  :...src: mesg",
    # no ws before the colon
    "0322 085338 TRACE:...src: mesg",
    # dots / colons in source+mesg territory
    "0322 085338 TRACE  :..a.b.c: m:e:s:g",
    "0322 085338 TRACE  :: mesg",          # empty dot-run -> regex reject
    "0322 085338 TRACE  :.: m",            # empty source
    "0322 085338 TRACE  :...src:mesg",     # no ws after 2nd colon
    "0322 085338 TRACE  :...src: ",        # empty mesg (unset tail)
    "0322 085338 TRACE  :...src:",         # nothing after 2nd colon
    # numeric edges
    "99999999999999999999 085338 TRACE  :...s: m",   # >18 digits
    "0322 085338 9INFO9  :...s: m",
    "-5 085338 TRACE  :...s: m",
    # whitespace shapes
    " 0322 085338 TRACE  :...s: m",
    "0322  085338\tTRACE \t :...s: m",
    "0322 085338 TRACE  EXTRA :...s: m",
    "",
    ":",
    "::",
    "0322",
]


def _run_extract(spec, arr):
    """The extract_regex tier-1 children+valid (plan disabled)."""
    rx, _ = _fast_plan(spec)
    st = pc.extract_regex(arr, pattern=rx)
    valid = pc.is_valid(st)
    for _, (i, f) in enumerate(spec.output_fields()):
        if f.ftype == FieldType.INT:
            long_run = pc.fill_null(
                pc.greater(pc.utf8_length(st.field(f"g{i}")), 18), False
            )
            valid = pc.and_(valid, pc.invert(long_run))
    out = {}
    for k, (i, f) in enumerate(spec.output_fields()):
        ch = pc.if_else(valid, st.field(f"g{i}"),
                        pa.scalar(None, pa.string()))
        if f.ftype == FieldType.INT:
            ch = ch.cast(pa.int64())
        out[k] = ch
    return out, valid


def _assert_plan_subset_equal(fmt, lines, compile_fn=compile_split_plan):
    """Plan-accepted rows must carry exactly the extract kernel's
    values; plan-rejected-but-regex-matched rows are allowed (walker
    fallback) — their children are unspecified and masked by the
    kernel (test_kernel_end_to_end_identical covers that)."""
    spec = compile_format(fmt)
    plan = compile_fn(spec)
    assert plan is not None, fmt
    rx, _ = _fast_plan(spec)
    arr = pa.array(lines)
    p_children, p_valid = plan.run(arr, rx)
    e_children, e_valid = _run_extract(spec, arr)
    pv = p_valid.to_pylist()
    ev = e_valid.to_pylist()
    for r, line in enumerate(lines):
        # the plan may only accept rows the regex accepts
        if pv[r]:
            assert ev[r], (fmt, line)
        if pv[r]:
            for k in p_children:
                got = p_children[k][r].as_py()
                want = e_children[k][r].as_py()
                assert got == want, (fmt, line, k, got, want)
    return sum(pv), sum(ev)


class TestRecognizer:
    def test_plan_specs_compile(self):
        for fmt in PLAN_SPECS:
            assert compile_split_plan(compile_format(fmt)) is not None, fmt

    def test_non_plan_specs_rejected(self):
        for fmt in NO_PLAN_SPECS:
            assert compile_split_plan(compile_format(fmt)) is None, fmt

    def test_default_format_shape(self):
        plan = compile_split_plan(compile_format(DEFAULT_FORMAT))
        assert plan.anchor == ":" and plan.dot == "."
        assert len(plan.tok_idx) == 3
        assert plan.tail_idx is not None and plan.tail_ws


class TestDifferential:
    def test_golden_corpus_full_coverage(self):
        """Every well-formed golden line must be PLAN-decided (the hot
        path must not leak rows to the walker on the real corpus)."""
        n_plan, n_extract = _assert_plan_subset_equal(
            DEFAULT_FORMAT, GOLDEN_LINES
        )
        # the plan must decide exactly the rows the regex kernel decides
        # (no coverage regression); both cover the corpus's regex-
        # decidable majority (58 well-formed minus walker-only endings)
        assert n_plan == n_extract
        assert n_plan >= 50

    @pytest.mark.parametrize("fmt", PLAN_SPECS)
    def test_adversarial_lines(self, fmt):
        _assert_plan_subset_equal(fmt, ADVERSARIAL)

    @pytest.mark.parametrize("fmt", PLAN_SPECS)
    def test_fuzzed_lines(self, fmt):
        rng = random.Random(42)
        alphabet = list("0123456789abcXYZ.: \t-") + [""]
        lines = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 24)))
            for _ in range(4000)
        ]
        # plus golden-line mutations
        for _ in range(500):
            base = list(rng.choice(GOLDEN_LINES))
            for _ in range(rng.randint(1, 3)):
                pos = rng.randrange(len(base))
                base[pos] = rng.choice("0: .x\t")
            lines.append("".join(base))
        _assert_plan_subset_equal(fmt, lines)

SEQ_SPECS = [
    "[{STR:Time}] {STR:Level}: {STR:Msg}",   # bracket + second anchor
    "{STR:A}: {STR:B}: {STR:C}",             # repeated delimiter
    "{INT:Pid}@{STR:Host} {STR:Rest}",       # glued literal, no ws
    "{INT:A}:{STR:B}",                       # all-INT group glued to lit
    "{STR:All}",                             # catch-all EOL (zero-copy)
    "{INT:A} {INT:B} {STR:C}: {STR:D}",      # tokens then anchor chain
    # dot-run + TWO anchor segments (legacy family allows only one)
    "{STR:Lvl} :{CHR:,.,1}{STR:Src}: {STR:Op}: {STR:Msg}",
]

SEQ_ADVERSARIAL = ADVERSARIAL + [
    "[12:30] INFO: all good",
    "[a]b",
    "[] W: ",
    "[t]  DOUBLE:  spaced msg ",
    "[t] a: b: c",
    "a: b: c: d",
    ": : ",
    "a:  b : c",
    "123@example.com hello world",
    "12@ x",
    "12@h ",
    "7:",
    "5:a:b",
    "[x[y]z] a: b",
    "]x[ a: b",
    "@@@",
    "1 2 c: d",
    "1 2 c:d",
]


class TestSeqPlan:
    def test_seq_specs_compile(self):
        """Multi-anchor shapes the single-anchor plan rejects compile
        to sequential plans (compile_any_split_plan covers them)."""
        for fmt in SEQ_SPECS:
            spec = compile_format(fmt)
            assert compile_seq_plan(spec) is not None, fmt
            assert compile_any_split_plan(spec) is not None, fmt

    def test_non_plan_specs_still_rejected(self):
        for fmt in NO_PLAN_SPECS[:2]:  # NCHAR, DBL
            assert compile_any_split_plan(compile_format(fmt)) is None, fmt
        # "{INT:A}x{STR:B}" was outside the LEGACY family but the seq
        # plan handles it (all-INT group glued to a literal)
        assert compile_seq_plan(compile_format("{INT:A}x{STR:B}")) \
            is not None

    def test_legacy_family_prefers_splitplan(self):
        """compile_any_split_plan keeps the measured single-anchor plan
        (fewer string copies) for its family."""
        from logparser_spark.operators.fastsplit import SplitPlan

        plan = compile_any_split_plan(compile_format(DEFAULT_FORMAT))
        assert isinstance(plan, SplitPlan)

    @pytest.mark.parametrize("fmt", SEQ_SPECS)
    def test_adversarial_lines(self, fmt):
        _assert_plan_subset_equal(fmt, SEQ_ADVERSARIAL,
                                  compile_fn=compile_seq_plan)

    @pytest.mark.parametrize("fmt", SEQ_SPECS)
    def test_fuzzed_lines(self, fmt):
        rng = random.Random(1337)
        alphabet = list("0123456789abcXYZ.:[]@ \t-") + [""]
        lines = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 24)))
            for _ in range(4000)
        ]
        for _ in range(500):
            base = list(rng.choice(GOLDEN_LINES))
            for _ in range(rng.randint(1, 3)):
                pos = rng.randrange(len(base))
                base[pos] = rng.choice("0:[]@ .x\t")
            lines.append("".join(base))
        _assert_plan_subset_equal(fmt, lines,
                                  compile_fn=compile_seq_plan)

    @pytest.mark.parametrize(
        "fmt", ["[{STR:Time}] {STR:Level}: {STR:Msg}",
                "{INT:Pid}@{STR:Host} {STR:Rest}"]
    )
    def test_kernel_end_to_end_identical_seq(self, fmt):
        """_batch_parse_arrow (seq plan on) vs (plan off) bit-identical
        INCLUDING walker fallback resolution and unset-suffix nulling."""
        from logparser_spark.operators.parse import _batch_parse_arrow

        spec_on = compile_format(fmt)
        spec_off = compile_format(fmt)
        spec_off.__dict__["_split_plan"] = None
        rx, suffix = _fast_plan(spec_on)
        lines = GOLDEN_LINES + SEQ_ADVERSARIAL + [None]
        arr = pa.array(lines, type=pa.string())
        outs_on, wf_on = _batch_parse_arrow(arr, spec_on, rx, suffix)
        outs_off, wf_off = _batch_parse_arrow(arr, spec_off, rx, suffix)
        assert wf_on.to_pylist() == wf_off.to_pylist()
        for a, b in zip(outs_on, outs_off):
            assert a.to_pylist() == b.to_pylist()


class TestDifferentialE2E:
    def test_kernel_end_to_end_identical(self):
        """_batch_parse_arrow (plan on) vs (plan off) must be
        bit-identical INCLUDING walker fallback resolution."""
        import os

        from logparser_spark.operators.parse import _batch_parse_arrow

        spec_on = compile_format(DEFAULT_FORMAT)
        spec_off = compile_format(DEFAULT_FORMAT)
        spec_off.__dict__["_split_plan"] = None  # pre-seed: plan disabled
        rx, suffix = _fast_plan(spec_on)
        lines = GOLDEN_LINES + ADVERSARIAL + [None]
        arr = pa.array(lines, type=pa.string())
        outs_on, wf_on = _batch_parse_arrow(arr, spec_on, rx, suffix)
        outs_off, wf_off = _batch_parse_arrow(arr, spec_off, rx, suffix)
        assert wf_on.to_pylist() == wf_off.to_pylist()
        for a, b in zip(outs_on, outs_off):
            assert a.to_pylist() == b.to_pylist()
