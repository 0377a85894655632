"""Filter DSL: parsing, canonical form, round-trip law, and oracle eval.

Mirrors /root/reference/tests/test_filter_roundtrip.cpp:250-547 and
test_filters.cpp:31-604 (comparators x types, 16-row boolean truth table,
invert, unknown-field throw, raw/line-number filters).
"""

import pytest

from logparser_spark.functions.formats import DEFAULT_FORMAT, compile_format
from logparser_spark.functions.oracle import (
    OracleLine,
    accepts,
    eval_filter,
    parse_line,
)
from logparser_spark.operators.filters import (
    CombinedFilter,
    FieldFilter,
    LineNumberFilter,
    RawLineFilter,
    compose,
    parse_filter,
)
from logparser_spark.sources.corpus import GOLDEN_LINES, INFO_LINE_IDS

SPEC = compile_format(DEFAULT_FORMAT)
# a simple format with one INT (Val) and one STR (Name), as in the
# reference's makeSimpleFormat
SIMPLE = compile_format("{INT:Val} {STR:Name}")


def rt(s, spec=SIMPLE):
    """round-trip: parse -> to_string -> parse; returns (ast, serialized)"""
    f1 = parse_filter(s, spec)
    ser = f1.to_string()
    f2 = parse_filter(ser, spec)
    return f1, ser, f2


class TestRoundTrip:
    def test_simple_eq(self):
        f1, ser, f2 = rt("Val EQ 42")
        assert ser == "Val EQ 42"
        assert f1.equals(f2)

    def test_alias_normalization(self):
        cases = {
            "Name EQUAL hello": "Name EQ hello",
            "Val GREATER_THAN 10": "Val GT 10",
            "Name CONTAINS hello": "Name CT hello",
            "Name BEGINS_WITH hel": "Name BW hel",
            "Name STARTS_WITH hel": "Name BW hel",
            "Name SW hel": "Name BW hel",
            "Name ENDS_WITH llo": "Name EW llo",
            "Val SMALLER_OR_EQUAL 7": "Val SE 7",
            "Val GREATER_EQ 3": "Val GE 3",
        }
        for src, want in cases.items():
            f1, ser, f2 = rt(src)
            assert ser == want, src
            assert f1.equals(f2)

    def test_ci_variant(self):
        f1, ser, f2 = rt("Name EQ_CI HELLO")
        # stored value is lowered at construction (line_filter.cpp:104-107)
        assert ser == "Name EQ_CI hello"
        assert f1.case_insensitive
        assert f1.equals(f2)

    def test_int_value_canonicalized(self):
        f1, ser, f2 = rt("Val EQ 085339")
        assert ser == "Val EQ 85339"
        assert f1.equals(f2)

    def test_line_num(self):
        f1, ser, f2 = rt("line_num CT 5,10")
        assert ser == "line_num CT 5,10"
        assert isinstance(f1, LineNumberFilter) and f1.lo == 5 and f1.hi == 10
        assert f1.equals(f2)

    def test_line_num_requires_ct(self):
        with pytest.raises(ValueError):
            parse_filter("line_num EQ 5,10", SIMPLE)

    def test_triple_and_right_associative(self):
        f1, ser, f2 = rt("Val EQ 1 AND Name EQ x AND Val EQ 2")
        assert ser == "(Val EQ 1) AND ((Name EQ x) AND (Val EQ 2))"
        assert f1.equals(f2)

    def test_mixed_or_and_no_precedence(self):
        # earliest op splits first: A OR (B AND C)
        # (test_filter_roundtrip.cpp:442-452)
        f1, ser, f2 = rt("Val EQ 1 OR Name EQ x AND Val EQ 2")
        assert ser == "(Val EQ 1) OR ((Name EQ x) AND (Val EQ 2))"
        assert f1.equals(f2)

    def test_parens_override(self):
        f_np = parse_filter("Val EQ 1 OR Name EQ x AND Val EQ 2", SIMPLE)
        f_p = parse_filter("(Val EQ 1 OR Name EQ x) AND Val EQ 2", SIMPLE)
        assert not f_np.equals(f_p)
        assert f_p.to_string() == "((Val EQ 1) OR (Name EQ x)) AND (Val EQ 2)"

    def test_global_paren_strip(self):
        f1 = parse_filter("(((Val EQ 42)))", SIMPLE)
        assert isinstance(f1, FieldFilter)
        assert f1.to_string() == "Val EQ 42"

    def test_idempotence(self):
        for s in [
            "Val EQ 1 OR Name EQ x AND Val EQ 2",
            "(Val EQ 1 XOR Name CT_CI AbC) NOR Name EW z",
            "line_num CT 3,9 AND Name BW q",
        ]:
            f1 = parse_filter(s, SIMPLE)
            s1 = f1.to_string()
            f2 = parse_filter(s1, SIMPLE)
            assert s1 == f2.to_string()
            assert f1.equals(f2)

    def test_unknown_field_raises(self):
        with pytest.raises(ValueError):
            parse_filter("Nope EQ 5", SIMPLE)

    def test_unbalanced_paren_raises(self):
        with pytest.raises(ValueError):
            parse_filter("(Val EQ 5", SIMPLE)

    def test_empty_returns_none(self):
        assert parse_filter("", SIMPLE) is None

    def test_invert_not_serialized_matches_reference(self):
        # to_string ignores the invert flag; operator== does not
        # (line_filter.hpp:31-44, to_string has no invert marker)
        f1 = parse_filter("Val EQ 1", SIMPLE)
        f2 = parse_filter("Val EQ 1", SIMPLE).invert()
        assert f1.to_string() == f2.to_string()
        assert f1.equals(f2) and not f1.same(f2)


def _mkline(raw, line_num=0, spec=SPEC):
    values, wf = parse_line(raw, spec)
    return OracleLine(raw_line=raw, line_num=line_num, values=values, well_formed=wf)


class TestOracleEval:
    LINE = _mkline(GOLDEN_LINES[4])  # the first INFO line

    def test_comparators_int(self):
        for s, want in [
            ("Time EQ 085338", True),
            ("Time GT 85337", True),
            ("Time GT 85338", False),
            ("Time GE 85338", True),
            ("Time ST 85339", True),
            ("Time SE 85338", True),
        ]:
            f = parse_filter(s, SPEC)
            assert eval_filter(f, self.LINE, SPEC) is want, s

    def test_comparators_str(self):
        for s, want in [
            ("Level EQ INFO", True),
            ("Level EQ info", False),
            ("Level EQ_CI iNfO", True),
            ("Source CT rsvp", True),
            ("Source CT_CI RSVP", True),
            ("Source BW rsvp", True),
            ("Source EW stateMachine", True),
            ("Mesg EW T1OUT", True),
            ("Level ST TRACE", True),  # 'INFO' < 'TRACE' bytewise
            ("Level GT EVENT", True),
        ]:
            f = parse_filter(s, SPEC)
            assert eval_filter(f, self.LINE, SPEC) is want, s

    def test_truth_table(self):
        # all 16 combos as in test_filters.cpp (T/F per side x 4 ops)
        t = parse_filter("Level EQ INFO", SPEC)   # True
        f = parse_filter("Level EQ ERROR", SPEC)  # False
        import itertools

        for (ln, lf_), (rn, rf) in itertools.product([("T", t), ("F", f)], repeat=2):
            lv, rv = ln == "T", rn == "T"
            for op, fn in [
                ("AND", lambda a, b: a and b),
                ("OR", lambda a, b: a or b),
                ("XOR", lambda a, b: a != b),
                ("NOR", lambda a, b: not (a or b)),
            ]:
                node = CombinedFilter(left=lf_, right=rf, op=op)
                assert eval_filter(node, self.LINE, SPEC) is fn(lv, rv), (ln, op, rn)

    def test_invert(self):
        f = parse_filter("Level EQ INFO", SPEC).invert()
        assert eval_filter(f, self.LINE, SPEC) is False

    def test_raw_and_linenum(self):
        raw = RawLineFilter(substr="T1OUT")
        assert eval_filter(raw, self.LINE, SPEC) is True
        ln = _mkline(GOLDEN_LINES[10], line_num=10)
        assert eval_filter(LineNumberFilter(lo=10, hi=50), ln, SPEC) is True
        assert eval_filter(LineNumberFilter(lo=0, hi=9), ln, SPEC) is False
        assert eval_filter(LineNumberFilter(lo=10, hi=10), ln, SPEC) is True

    def test_info_selection_on_corpus(self):
        f = parse_filter("Level EQ INFO", SPEC)
        ids = [
            i
            for i, l in enumerate(GOLDEN_LINES)
            if _mkline(l, i).well_formed and eval_filter(f, _mkline(l, i), SPEC)
        ]
        assert ids == INFO_LINE_IDS

    def test_accept_bad_format_rule(self):
        f = parse_filter("Level EQ INFO", SPEC)
        rows = [_mkline(l, i) for i, l in enumerate(GOLDEN_LINES)]
        kept = [r for r in rows if accepts(f, r, SPEC, accept_bad_format=True)]
        assert len(kept) == 14  # 10 INFO + 4 malformed (test_helpers.hpp:30)
        kept_strict = [r for r in rows if accepts(f, r, SPEC, accept_bad_format=False)]
        assert len(kept_strict) == 10
        # no filter, accept=False -> the 58 well-formed lines
        all_wf = [r for r in rows if accepts(None, r, SPEC, accept_bad_format=False)]
        assert len(all_wf) == 58

    def test_null_field_filter_is_null(self):
        # well-formed early-exhausted line: Level unset -> NULL verdict -> not routed
        row = _mkline("0322 085338", SPEC and 0 or 0)
        row = _mkline("0322 085338")
        f = parse_filter("Level EQ INFO", SPEC)
        assert eval_filter(f, row, SPEC) is None
        assert accepts(f, row, SPEC, accept_bad_format=True) is False


class TestCompose:
    def test_verbs(self):
        base = parse_filter("Level EQ INFO", SPEC)
        new = parse_filter("Time GT 85338", SPEC)
        assert compose(base, new, "fand").to_string() == \
            "(Level EQ INFO) AND (Time GT 85338)"
        assert compose(base, new, "for").op == "OR"
        assert compose(base, new, "fxor").op == "XOR"
        assert compose(base, new, "fnor").op == "NOR"
        out = compose(base, parse_filter("Time GT 85338", SPEC), "fout")
        assert out.op == "AND" and out.right.inverted
        assert compose(base, new, "fset") is new
        assert compose(None, new, "fand") is new


def test_resolve_filter_arg_file_vs_text(tmp_path):
    """:f* argument convention (filter_management_module.cpp:53-66):
    readable file -> first line is the filter text; else the arg IS the
    filter text."""
    from logparser_spark.operators.filters import (
        parse_filter,
        resolve_filter_arg,
    )
    from logparser_spark.functions.formats import (
        DEFAULT_FORMAT,
        compile_format,
    )

    p = tmp_path / "filt.txt"
    p.write_text("Level EQ INFO\nsecond line ignored\n")
    assert resolve_filter_arg(str(p)) == "Level EQ INFO"
    assert resolve_filter_arg("Level EQ WARN") == "Level EQ WARN"
    assert resolve_filter_arg(str(tmp_path / "missing")) == str(
        tmp_path / "missing"
    )
    # the loaded text parses like any inline declaration
    spec = compile_format(DEFAULT_FORMAT)
    f = parse_filter(resolve_filter_arg(str(p)), spec)
    assert f is not None
    # explicit @/path marker: always a file, missing file raises
    assert resolve_filter_arg("@" + str(p)) == "Level EQ INFO"
    with pytest.raises(OSError):
        resolve_filter_arg("@" + str(tmp_path / "missing"))
    # declarative mode (probe_paths=False): bare paths are NOT probed —
    # an expression naming a readable file stays literal; @ still works
    assert resolve_filter_arg(str(p), probe_paths=False) == str(p)
    assert resolve_filter_arg("@" + str(p), probe_paths=False) == (
        "Level EQ INFO"
    )
