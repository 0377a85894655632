"""Filter-predicate DSL: AST, parser, canonical form, and Catalyst compiler.

Reimplements the reference's filter engine
(``/root/reference/src/file_parsing/filter_parsing.cpp:91-163``,
``line_filter.cpp``) semantics:

- grammar: ``<field> <CMP> <value>``, parenthesized groups, binary
  ``AND/OR/XOR/NOR`` with **no precedence**: the earliest operator token
  splits first and the rest re-parses, so chains group right-associatively
  (``A OR B AND C`` == ``A OR (B AND C)``, proven by the reference's
  ``tests/test_filter_roundtrip.cpp:442-452``);
- comparator aliases (``EQUAL -> EQ``, ``SMALLER_THAN -> ST``,
  ``STARTS_WITH -> BW``, ...) each with a ``_CI`` case-insensitive variant
  (``filter_parsing.cpp:55-86``); the earliest tag occurrence wins, ties by
  the reference's check order;
- special form ``line_num CT a,b`` -> inclusive per-document line-range
  filter (``filter_parsing.cpp:144-160``);
- ``to_string`` canonical short-tag form with full parenthesization and
  ``equals`` structural equality (``line_filter.cpp:293-376``); like the
  reference, ``to_string`` does NOT encode the invert flag;
- invert-via-XOR wrapper on every node (``line_filter.hpp:31-39``).

``to_column`` lowers an AST to a single PySpark ``Column`` over the parsed
struct — Catalyst then gets full predicate pushdown / boolean simplification
for free (the reference's hand-rolled short-circuiting, SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Optional, Union

from ..functions.formats import FieldType, FormatSpec

# ── AST ───────────────────────────────────────────────────────────────


@dataclass
class _Node:
    inverted: bool = dc_field(default=False, kw_only=True)

    def invert(self):
        self.inverted = not self.inverted
        return self

    # reference operator== checks invert flag + structural equals
    def same(self, other) -> bool:
        return self.inverted == other.inverted and self.equals(other)


@dataclass
class FieldFilter(_Node):
    field: str
    cmp: str  # short tag: EQ ST SE GT GE CT BW EW
    value: str
    case_insensitive: bool = False

    def to_string(self, spec: Optional[FormatSpec] = None) -> str:
        tag = self.cmp + ("_CI" if self.case_insensitive else "")
        return f"{self.field} {tag} {self.value}"

    def equals(self, other) -> bool:
        return (
            isinstance(other, FieldFilter)
            and self.field == other.field
            and self.cmp == other.cmp
            and self.case_insensitive == other.case_insensitive
            and self.value == other.value
        )


@dataclass
class CombinedFilter(_Node):
    left: "Filter"
    right: "Filter"
    op: str  # AND OR XOR NOR

    def to_string(self, spec: Optional[FormatSpec] = None) -> str:
        return (
            f"({self.left.to_string(spec)}) {self.op} "
            f"({self.right.to_string(spec)})"
        )

    def equals(self, other) -> bool:
        return (
            isinstance(other, CombinedFilter)
            and self.op == other.op
            and self.left.same(other.left)
            and self.right.same(other.right)
        )


@dataclass
class LineNumberFilter(_Node):
    lo: int
    hi: int

    def to_string(self, spec: Optional[FormatSpec] = None) -> str:
        return f"line_num CT {self.lo},{self.hi}"

    def equals(self, other) -> bool:
        return (
            isinstance(other, LineNumberFilter)
            and self.lo == other.lo
            and self.hi == other.hi
        )


@dataclass
class RawLineFilter(_Node):
    substr: str

    def to_string(self, spec: Optional[FormatSpec] = None) -> str:
        return f"raw_contains:{self.substr}"

    def equals(self, other) -> bool:
        return isinstance(other, RawLineFilter) and self.substr == other.substr


Filter = Union[FieldFilter, CombinedFilter, LineNumberFilter, RawLineFilter]

# ── parser ────────────────────────────────────────────────────────────

_BITWISE_TAGS = ["AND", "OR", "XOR", "NOR"]  # reference check order

# (alias, short_tag) in the reference's exact check order
# (filter_parsing.cpp:55-86); earliest occurrence wins, ties to first-checked.
_CMP_ALIASES = [
    ("EQ", "EQ"),
    ("EQUAL", "EQ"),
    ("ST", "ST"),
    ("SMALLER", "ST"),
    ("SMALLER_THAN", "ST"),
    ("SE", "SE"),
    ("SMALLER_EQ", "SE"),
    ("SMALLER_EQUAL", "SE"),
    ("SMALLER_OR_EQUAL", "SE"),
    ("GT", "GT"),
    ("GREATER", "GT"),
    ("GREATER_THAN", "GT"),
    ("GE", "GE"),
    ("GREATER_EQ", "GE"),
    ("GREATER_EQUAL", "GE"),
    ("GREATER_OR_EQUAl", "GE"),  # [sic] reference typo, kept for parity
    ("CT", "CT"),
    ("CONTAINS", "CT"),
    ("BW", "BW"),
    ("BEGINS_WITH", "BW"),
    ("SW", "BW"),
    ("STARTS_WITH", "BW"),
    ("EW", "EW"),
    ("ENDS_WITH", "EW"),
]


def _find_next_bitwise_op(s: str, start: int = 0) -> tuple[int, str]:
    """Earliest ' OP ' token at/after ``start``; returns (pos_of_op, op) or
    (-1, '') — pos is the index of the op word's first char."""
    best, op = -1, ""
    for tag in _BITWISE_TAGS:
        v = s.find(f" {tag} ", start)
        if v != -1 and (best == -1 or v + 1 < best):
            best, op = v + 1, tag
    return best, op


def _find_next_comparator(s: str) -> tuple[int, int, str, bool]:
    """Earliest comparator tag: (pos, tag_len, short_tag, case_insensitive)."""
    best, size, short, ci = -1, 0, "", False
    for alias, tag in _CMP_ALIASES:
        v = s.find(f" {alias} ")
        if v != -1 and (best == -1 or v + 1 < best):
            best, size, short, ci = v + 1, len(alias), tag, False
        v = s.find(f" {alias}_CI ")
        if v != -1 and (best == -1 or v + 1 < best):
            best, size, short, ci = v + 1, len(alias) + 3, tag, True
    return best, size, short, ci


def parse_filter(
    fdecl: str, spec: Optional[FormatSpec] = None
) -> Optional[Filter]:
    """Parse a filter declaration; mirror of ``parse_filter_decl``
    (filter_parsing.cpp:91-163). ``spec`` is used to validate field names
    (unknown field -> ValueError, matching the reference throw)."""
    while True:
        if fdecl == "":
            return None
        fdecl = fdecl.strip()
        if not fdecl.startswith("("):
            break
        # find matching close paren
        depth, end = 0, 0
        while end < len(fdecl):
            if fdecl[end] == "(":
                depth += 1
            elif fdecl[end] == ")":
                depth -= 1
                if depth == 0:
                    break
            end += 1
        if end == len(fdecl):
            raise ValueError("Found '(' but no matching ')'")
        if end + 1 == len(fdecl):
            fdecl = fdecl[1:-1]  # global parens: strip and restart
            continue
        left = parse_filter(fdecl[1:end], spec)
        pos, op = _find_next_bitwise_op(fdecl, end)
        if pos == -1:
            raise ValueError(f"expected boolean op after ')' in {fdecl!r}")
        right = parse_filter(fdecl[pos + len(op):], spec)
        return CombinedFilter(left=left, right=right, op=op)

    pos, op = _find_next_bitwise_op(fdecl)
    if pos != -1:
        left = parse_filter(fdecl[:pos], spec)
        right = parse_filter(fdecl[pos + len(op):], spec)
        return CombinedFilter(left=left, right=right, op=op)

    tag_pos, tag_size, cmp, ci = _find_next_comparator(fdecl)
    if tag_pos == -1:
        raise ValueError(
            f"Could not find any recognized comparison operator in {fdecl!r}"
        )
    field_name = fdecl[:tag_pos].strip()
    value_str = fdecl[tag_pos + tag_size:].strip()

    if field_name == "line_num":
        if cmp != "CT":
            raise ValueError("line_num filter must use CT/CONTAINS")
        comma = value_str.find(",")
        lo_s = value_str[:comma].strip()
        hi_s = value_str[comma + 1:].strip()
        if not lo_s[:1].isdigit() or not hi_s[:1].isdigit():
            raise ValueError("line_num bounds must be numbers")
        return LineNumberFilter(lo=int(lo_s), hi=int(hi_s))

    if spec is not None:
        loc = spec.field_by_name(field_name)
        if loc is None:
            raise ValueError(f"Couldn't find field named {field_name}")
        # Canonicalize the value to the typed form the reference stores
        # (FieldFilter ctor: stol/stod/str_value[0], line_filter.cpp:87-107),
        # so to_string/equals behave like the reference's typed members
        # (e.g. "085339" -> "85339", "3.14" -> "3.140000").
        ft = loc[1].ftype
        if ft == FieldType.INT:
            value_str = str(int(value_str))
        elif ft == FieldType.DBL:
            value_str = f"{float(value_str):.6f}"  # std::to_string(double)
        elif ft == FieldType.DATE:
            # engine extension: canonicalize to ISO (rejects malformed
            # comparison values at filter-compile time, like stol does);
            # substring verbs are meaningless on a typed date
            import datetime

            if cmp in ("CT", "BW", "EW"):
                raise ValueError(
                    f"{cmp} not supported on DATE field {field_name}"
                )
            value_str = datetime.date.fromisoformat(value_str).isoformat()
        elif ft == FieldType.CHR:
            value_str = value_str[:1]
        elif ft == FieldType.STR and ci:
            # the reference lowers the stored value at construction
            # (line_filter.cpp:104-107), so to_string shows the lowered form
            value_str = "".join(
                chr(ord(c) + 32) if "A" <= c <= "Z" else c for c in value_str
            )
    return FieldFilter(
        field=field_name, cmp=cmp, value=value_str, case_insensitive=ci
    )


# ── Catalyst lowering ─────────────────────────────────────────────────


def _ascii_lower_col(col):
    """ASCII-only lowercase, matching C ``tolower`` (line_filter.cpp:105,229).
    ``F.lower`` is Unicode-aware; translate the 26 ASCII uppercase letters
    instead so byte semantics agree on any input."""
    from pyspark.sql import functions as F

    return F.translate(
        col,
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
        "abcdefghijklmnopqrstuvwxyz",
    )


def to_column(
    node: Optional[Filter],
    spec: FormatSpec,
    parsed_col: str = "parsed",
    line_num_col: str = "line_no",
    raw_col: str = "raw_line",
):
    """Lower a filter AST to a PySpark boolean Column over the parsed struct.

    String comparisons rely on Spark's default binary (UTF8_BINARY) collation,
    which agrees bytewise with the reference's ``string_view`` comparisons for
    the ASCII corpus (SURVEY.md §7.4 risk 6).
    """
    from pyspark.sql import functions as F

    if node is None:
        return F.lit(True)

    if isinstance(node, CombinedFilter):
        left = to_column(node.left, spec, parsed_col, line_num_col, raw_col)
        right = to_column(node.right, spec, parsed_col, line_num_col, raw_col)
        if node.op == "AND":
            col = left & right
        elif node.op == "OR":
            col = left | right
        elif node.op == "XOR":
            col = left != right
        else:  # NOR
            col = ~(left | right)
    elif isinstance(node, FieldFilter):
        loc = spec.field_by_name(node.field)
        if loc is None:
            raise ValueError(f"no field named {node.field}")
        i, f = loc
        cols = spec.column_names()
        out_pos = [k for k, (j, _) in enumerate(spec.output_fields()) if j == i][0]
        c = F.col(f"{parsed_col}.{cols[out_pos]}")
        if f.ftype == FieldType.INT:
            v = F.lit(int(node.value))
        elif f.ftype == FieldType.DBL:
            v = F.lit(float(node.value))
        elif f.ftype == FieldType.DATE:
            import datetime

            v = F.lit(datetime.date.fromisoformat(node.value))
        elif f.ftype == FieldType.CHR:
            v = F.lit(node.value[0] if node.value else "")
        else:
            v = F.lit(node.value)
            if node.case_insensitive:
                c = _ascii_lower_col(c)
                v = F.lit(
                    "".join(
                        chr(ord(ch) + 32) if "A" <= ch <= "Z" else ch
                        for ch in node.value
                    )
                )
        ops = {
            "EQ": lambda a, b: a == b,
            "ST": lambda a, b: a < b,
            "SE": lambda a, b: a <= b,
            "GT": lambda a, b: a > b,
            "GE": lambda a, b: a >= b,
            "CT": lambda a, b: a.contains(b),
            "BW": lambda a, b: a.startswith(b),
            "EW": lambda a, b: a.endswith(b),
        }
        col = ops[node.cmp](c, v)
    elif isinstance(node, LineNumberFilter):
        col = F.col(line_num_col).between(node.lo, node.hi)
    elif isinstance(node, RawLineFilter):
        col = F.col(raw_col).contains(node.substr)
    else:
        raise TypeError(f"unknown filter node {type(node)}")

    return ~col if node.inverted else col


def accept_expr(
    filter_col,
    well_formed_col=None,
    accept_bad_format: bool = True,
):
    """Wrap a sink predicate in the malformed-acceptance rule
    (filtered_file_reader.cpp:258-262)::

        (NOT well_formed AND accept_bad_format)
        OR (well_formed AND (filter IS NULL OR filter(parsed)))

    Every sink predicate MUST pass through this (SURVEY.md §2.3 F10).
    """
    from pyspark.sql import functions as F

    if well_formed_col is None:
        well_formed_col = F.col("parsed.well_formed")
    return (~well_formed_col & F.lit(accept_bad_format)) | (
        well_formed_col & filter_col
    )


# ── filter composition algebra (the :f* command verbs) ────────────────


def compose(
    base: Optional[Filter], new: Filter, verb: str
) -> Filter:
    """Sink-spec composition mirroring FilterManagementModule verbs
    (filter_management_module.cpp:37-104): ``fset`` replace, ``fand``/``f``/
    ``fadd`` AND-in, ``for`` OR-in, ``fxor`` XOR-in, ``fnor`` NOR-in,
    ``fout`` AND-in inverted."""
    if verb == "fset" or base is None:
        if verb == "fout":
            return new.invert()
        return new
    if verb in ("f", "fadd", "fand"):
        return CombinedFilter(left=base, right=new, op="AND")
    if verb == "for":
        return CombinedFilter(left=base, right=new, op="OR")
    if verb == "fxor":
        return CombinedFilter(left=base, right=new, op="XOR")
    if verb == "fnor":
        return CombinedFilter(left=base, right=new, op="NOR")
    if verb == "fout":
        return CombinedFilter(left=base, right=new.invert(), op="AND")
    raise ValueError(f"unknown filter verb {verb!r}")


def resolve_filter_arg(arg: str, probe_paths: bool = True) -> str:
    """The reference's filter-argument convention
    (filter_management_module.cpp:53-66): the ``:f*`` argument is tried
    as a FILE PATH first — if a readable file exists there, the filter
    text is the file's FIRST LINE; otherwise the argument itself is the
    filter text. Lets users keep long filter declarations in files
    (``:fset /path/to/filter.txt``).

    Two hardenings over the bare reference behavior (a filter expression
    that coincidentally names a readable file would otherwise be
    silently and environment-dependently replaced by that file's first
    line):

    - ``@/path`` is an EXPLICIT file marker: the rest is always read as
      a file, and a missing/unreadable file raises instead of being
      treated as filter text.
    - when bare-path probing wins, the substitution is logged at INFO so
      declarative job configs can't swap semantics silently. Declarative
      callers (JobConfig) pass ``probe_paths=False`` to keep bare
      probing interactive-frontend-only.
    """
    import logging

    if arg.startswith("@"):
        with open(arg[1:]) as f:
            return f.readline().rstrip("\n").rstrip("\r")
    if not probe_paths:
        return arg
    try:
        with open(arg) as f:
            text = f.readline().rstrip("\n").rstrip("\r")
    except OSError:
        return arg
    logging.getLogger(__name__).info(
        "filter argument %r resolved as a FILE; using its first line %r "
        "(use @%s to make this explicit)", arg, text, arg
    )
    return text
