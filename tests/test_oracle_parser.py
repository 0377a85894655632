"""Oracle parser vs the reference's golden values.

Pins the parse contract before any Spark code runs (SURVEY.md §7.2 step 1).
Golden facts from /root/reference/tests/test_line_parser.cpp:5-44,
test_line_format.cpp, test_helpers.hpp:27-125, tests/data/sample.log.
"""

import pathlib

import pytest

from logparser_spark.functions.formats import (
    DEFAULT_FORMAT,
    FieldType,
    StrStop,
    compile_format,
)
from logparser_spark.functions.oracle import parse_line, split_lines
from logparser_spark.sources.corpus import (
    GOLDEN_LINES,
    INFO_LINE_IDS,
    MALFORMED_LINE_IDS,
)

DATA = pathlib.Path(__file__).parent / "data"
SPEC = compile_format(DEFAULT_FORMAT)


def _named(values):
    cols = SPEC.column_names()
    return dict(zip(cols, values))


class TestFormatCompile:
    def test_default_format_field_counts(self):
        # 2 INT, 0 DBL, 3 CHR (':', '.', ':'), 3 STR, 4 WS (test_helpers.hpp:45)
        c = SPEC.counts()
        assert c == {"INT": 2, "DBL": 0, "CHR": 3, "STR": 3, "WS": 4,
                     "DATE": 0}

    def test_default_format_field_kinds(self):
        kinds = [f.ftype for f in SPEC.fields]
        assert kinds == [
            FieldType.INT, FieldType.WS, FieldType.INT, FieldType.WS,
            FieldType.STR, FieldType.WS, FieldType.CHR, FieldType.CHR,
            FieldType.STR, FieldType.CHR, FieldType.WS, FieldType.STR,
        ]
        # {CHR:,.,1} is the repeated dot-run eater (test_helpers.hpp:44-60)
        dot = SPEC.fields[7]
        assert dot.target == "." and dot.repeat
        # {STR:Source}: stops at ':'
        src = SPEC.fields[8]
        assert src.stop == StrStop.DELIM and src.delim == ":"
        # trailing {STR:Mesg} reads to EOL (delim '\0')
        mesg = SPEC.fields[11]
        assert mesg.stop == StrStop.DELIM and mesg.delim == "\0"

    def test_nchar_and_catchall(self):
        s = compile_format("{STR:Name,5}")
        assert s.fields[0].stop == StrStop.NCHAR and s.fields[0].nchar == 5
        s = compile_format("{STR:,0}")
        assert s.fields[0].stop == StrStop.NCHAR and s.fields[0].nchar == 0

    def test_unnamed_fields_not_filterable(self):
        assert SPEC.field_by_name("") is None
        assert SPEC.field_by_name("Date") is not None

    def test_duplicate_name_last_wins(self):
        s = compile_format("{INT:X} {STR:X}")
        i, f = s.field_by_name("X")
        assert f.ftype == FieldType.STR and i == 2

    def test_dbl_format(self):
        s = compile_format("{DBL:Val}")
        assert s.fields[0].ftype == FieldType.DBL


class TestGoldenParse:
    def test_first_line_values(self):
        # test_line_parser.cpp:24-40: leading-zero collapse 0322 -> 322
        v, wf = parse_line(GOLDEN_LINES[0], SPEC)
        assert wf
        d = _named(v)
        assert d["Date"] == 322
        assert d["Time"] == 85338
        assert d["Level"] == "TRACE"
        # the dot-run is consumed by the {CHR:,.,1} repeat field, so Source
        # excludes it (reference test_line_parser.cpp:28)
        assert d["Source"] == "router_forward_getOI"
        assert d["Mesg"] == "source address:   9.67.116.98"

    def test_corpus_wellformed_count(self):
        wf = [parse_line(l, SPEC)[1] for l in GOLDEN_LINES]
        assert sum(wf) == 58  # test_filtered_file_reader.cpp:207
        assert [i for i, ok in enumerate(wf) if not ok] == MALFORMED_LINE_IDS

    def test_info_line_ids(self):
        ids = []
        for i, l in enumerate(GOLDEN_LINES):
            v, wf = parse_line(l, SPEC)
            if wf and _named(v)["Level"] == "INFO":
                ids.append(i)
        assert ids == INFO_LINE_IDS  # count_to_info_line, test_helpers.hpp:111-125

    def test_crlf_twin_identical(self):
        crlf = (DATA / "sample_crlf.log").read_bytes().decode()
        lf = (DATA / "sample.log").read_bytes().decode()
        assert split_lines(crlf) == split_lines(lf)
        for a, b in zip(split_lines(crlf), split_lines(lf)):
            assert parse_line(a, SPEC) == parse_line(b, SPEC)

    def test_lastline_mesg(self):
        v, wf = parse_line(GOLDEN_LINES[61], SPEC)
        assert wf and _named(v)["Mesg"].endswith("LASTLINE")


class TestParseEdgeSemantics:
    """The quirky rules from parsing_basics.cpp that regex alone cannot express."""

    def test_int_zero_rule(self):
        s = compile_format("{INT:X}")
        assert parse_line("0", s) == ([0], True)
        assert parse_line("0322", s) == ([322], True)
        # atol('abc')==0 and first char != '0' -> instruction fails
        assert parse_line("abc", s)[1] is False

    def test_int_overflow_saturates(self):
        # C atol == strtol saturates at LONG_MIN/LONG_MAX on overflow
        # (the contract every vectorized tier routes >18-digit runs to)
        from logparser_spark.functions.oracle import INT64_MAX, INT64_MIN

        s = compile_format("{INT:X}")
        assert parse_line("9" * 23, s) == ([INT64_MAX], True)
        assert parse_line("9223372036854775807", s) == ([INT64_MAX], True)
        assert parse_line("9223372036854775808", s) == ([INT64_MAX], True)
        s2 = compile_format("{INT:X}-{INT:Y}")
        v, wf = parse_line("-" + "9" * 23, s2)
        assert wf and v[0] == INT64_MIN
        # saturation never trips the zero-rule
        assert parse_line("0" * 25, s) == ([0], True)

    def test_int_sign_not_consumed(self):
        # parse_int('-5'): value -5 by atol, cursor unmoved -> '-' must be
        # consumed by a following literal (parsing_basics.cpp:7-13)
        s = compile_format("{INT:X}-{INT:Y}")
        v, wf = parse_line("-5", s)
        assert wf and v == [-5, "-", 5]  # literal CHR is an output field
        # without a '-' literal the tail never gets consumed -> malformed
        s2 = compile_format("{INT:X}")
        assert parse_line("-5", s2)[1] is False

    def test_dbl_single_dot_rule(self):
        s = compile_format("{DBL:X}.{INT:Y}")
        # '1.2.3': DBL consumes '1.2' (one dot), literal '.' then INT 3
        v, wf = parse_line("1.2.3", s)
        assert wf and v == [pytest.approx(1.2), ".", 3]

    def test_dbl_zero_rule(self):
        s = compile_format("{DBL:X}")
        assert parse_line("0.5", s) == ([0.5], True)
        v, wf = parse_line(".5", s)  # atof .5 != 0, consumes '.5'
        assert wf and v == [0.5]
        assert parse_line(".x", s)[1] is False  # atof 0.0, first char != '0'

    def test_chr_repeat(self):
        s = compile_format("{CHR:Dots,.,1}x")
        assert parse_line("....x", s) == ([".", "x"], True)
        assert parse_line("x", s)[1] is False
        s2 = compile_format("{CHR:Dot,.,0}x")
        assert parse_line(".x", s2) == ([".", "x"], True)
        assert parse_line("..x", s2)[1] is False  # second dot unconsumed

    def test_trailing_fields_skipped_on_exact_eol(self):
        # line exhausts at a field boundary -> well-formed, trailing unset
        # (line_parser.cpp:65 loop guard + :96 exact-landing rule)
        v, wf = parse_line("0322 085338", SPEC)
        assert wf
        d = _named(v)
        assert d["Date"] == 322 and d["Time"] == 85338
        assert d["Level"] is None and d["Source"] is None and d["Mesg"] is None

    def test_extra_tail_is_malformed(self):
        s = compile_format("{INT:X}")
        assert parse_line("123 tail", s)[1] is False

    def test_empty_line_wellformed(self):
        v, wf = parse_line("", SPEC)
        assert wf and all(x is None for x in v)

    def test_ws_zero_or_more(self):
        # parse_ws never fails; zero whitespace is fine (parsing_basics.cpp:71-74)
        s = compile_format("a b")
        assert parse_line("ab", s)[1] is True
        assert parse_line("a    b", s)[1] is True
        assert parse_line("a\t \tb", s)[1] is True

    def test_nchar_overrun_malformed(self):
        s = compile_format("{STR:X,10}")
        assert parse_line("abc", s)[1] is False
        assert parse_line("abcdefghij", s) == (["abcdefghij"], True)

    def test_str_nchar_zero(self):
        s = compile_format("{STR:X,0}y")
        assert parse_line("y", s) == (["", "y"], True)

    def test_str_anyws_stops_at_tab(self):
        s = compile_format("{STR:A} {STR:B}")
        v, wf = parse_line("foo\tbar", s)
        assert wf and v == ["foo", "bar"]


class TestSplitLines:
    def test_trailing_newline_no_empty_line(self):
        assert split_lines("a\nb\n") == ["a", "b"]
        assert split_lines("a\nb") == ["a", "b"]
        assert split_lines("a\r\nb\r\n") == ["a", "b"]
        assert split_lines("") == [""]
        assert split_lines("a\n\n") == ["a", ""]

    def test_lone_cr_kept(self):
        # '\r' not followed by '\n' is payload (filtered_file_reader not_eol)
        assert split_lines("a\rb\nc") == ["a\rb", "c"]
