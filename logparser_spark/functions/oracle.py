"""Pure-Python oracle: byte-exact reimplementation of the reference parser
and filter semantics. No Spark imports — this module pins the contract that
the vectorized operators are tested against.

Parser semantics from ``/root/reference/src/line_parsing/parsing_basics.cpp``
and ``line_parser.cpp:58-98``:

- instructions run left-to-right while ``cursor < len(line)``; any failure
  => malformed; success iff the cursor lands exactly at end-of-line;
- trailing instructions are silently skipped when the line is exhausted,
  leaving their fields unset (we represent unset as ``None``);
- INT: value = C ``atol`` of the remaining text (skips leading whitespace and
  an optional sign *by value*); fails iff value == 0 and the char at the
  cursor is not ``'0'``; the cursor then advances only over ``[0-9]+`` —
  so ``-5`` parses to -5 WITHOUT consuming anything (parsing_basics.cpp:7-13);
- DBL: value = C ``atof`` prefix of the remaining text; same zero-rule; the
  cursor advances over digits plus at most one ``'.'`` (``:15-22``);
- CHR: must match the target char; greedy run consumed when repeat (``:24-39``);
- STR: substring to an NCHAR count / DELIM char / ANY_WS stop, bounded by
  EOL; never fails (``:41-69``). NCHAR may step past EOL => malformed via the
  exact-landing rule (the reference would read bytes beyond the line from the
  mmap; with materialized per-line strings we clamp the captured text, which
  only affects lines that are malformed anyway);
- WS: skip a run of C-isspace chars except ``\\n``; zero chars is fine (``:71-74``).

Filter semantics from ``/root/reference/src/file_parsing/line_filter.cpp``:
typed comparisons, ASCII-tolower case-insensitive STR mode, AND/OR/XOR/NOR
combination with the reference's left-first short-circuit, invert-via-XOR,
raw-substring and inclusive line-number filters. The acceptance rule
(``filtered_file_reader.cpp:258-262``)::

    passes = (not well_formed and accept_bad_format)
             or (well_formed and (filter is None or filter(line)))
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

from .formats import (
    C_WHITESPACE,
    WS_NO_NEWLINE,
    FieldSpec,
    FieldType,
    FormatSpec,
    StrStop,
)

# C strtod prefix: optional ws + sign, then hex-float | decimal | inf | nan.
_ATOF_RE = re.compile(
    r"[ \t\n\v\f\r]*[+-]?(?:"
    r"0[xX][0-9a-fA-F]+(?:\.[0-9a-fA-F]*)?(?:[pP][+-]?[0-9]+)?"
    r"|0[xX]\.[0-9a-fA-F]+(?:[pP][+-]?[0-9]+)?"
    r"|(?:[0-9]+(?:\.[0-9]*)?|\.[0-9]+)(?:[eE][+-]?[0-9]+)?"
    r"|[iI][nN][fF](?:[iI][nN][iI][tT][yY])?"
    r"|[nN][aA][nN]"
    r")"
)
_ATOL_RE = re.compile(r"[ \t\n\v\f\r]*([+-]?)([0-9]*)")
_DIGITS = set("0123456789")
# DATE field (engine extension, see formats.FieldType.DATE): exact
# ISO shape, calendar-validated via datetime.date (years 1-9999)
_DATE_RE = re.compile(r"[0-9]{4}-[0-9]{2}-[0-9]{2}")

# INT overflow contract (applies to EVERY parse tier): C ``atol`` is
# ``strtol(s, NULL, 10)`` which SATURATES at LONG_MIN/LONG_MAX on
# overflow (glibc, ISO C 7.22.1.4) — so a 19+-digit run parses to the
# clamped int64 bound, never raises, never goes NULL. The vectorized
# tiers route >18-digit captures here (18 digits always fit int64).
INT64_MAX = (1 << 63) - 1
INT64_MIN = -(1 << 63)


def _atol(s: str) -> int:
    m = _ATOL_RE.match(s)
    sign, digits = m.group(1), m.group(2)
    if not digits:
        return 0
    v = int(digits)
    if sign == "-":
        return max(-v, INT64_MIN)
    return min(v, INT64_MAX)


def _atof(s: str) -> float:
    m = _ATOF_RE.match(s)
    if not m:
        return 0.0
    txt = m.group(0).strip()
    low = txt.lstrip("+-").lower()
    try:
        if low.startswith("0x"):
            # float.fromhex needs an exponent-free form to still be valid hex
            return float.fromhex(txt)
        return float(txt)
    except ValueError:
        # e.g. "0x" with no digits — strtod would stop at "0"
        return _atof_fallback(txt)


def _atof_fallback(txt: str) -> float:
    for end in range(len(txt), 0, -1):
        try:
            return float(txt[:end])
        except ValueError:
            continue
    return 0.0


def parse_line(line: str, spec: FormatSpec) -> tuple[list, bool]:
    """Parse one (already newline-free) line.

    Returns ``(values, well_formed)`` where ``values`` has one slot per
    non-WS field, positionally aligned with ``spec.output_fields()``;
    unset/failed fields are ``None``. On malformation all values are
    ``None`` (the reference leaves garbage in unset slots; ``None`` is the
    deterministic stand-in and nothing downstream may read them).
    """
    n = len(line)
    cursor = 0
    values: list = [None] * len(spec.output_fields())
    out_idx = {i: k for k, (i, _) in enumerate(spec.output_fields())}

    for i, f in enumerate(spec.fields):
        if cursor >= n:
            break
        rest = line[cursor:]
        if f.ftype == FieldType.INT:
            v = _atol(rest)
            if v == 0 and line[cursor] != "0":
                return [None] * len(values), False
            values[out_idx[i]] = v
            while cursor < n and line[cursor] in _DIGITS:
                cursor += 1
        elif f.ftype == FieldType.DBL:
            v = _atof(rest)
            if v == 0.0 and line[cursor] != "0":
                return [None] * len(values), False
            values[out_idx[i]] = v
            dot_ok = True
            while cursor < n and (
                line[cursor] in _DIGITS or (line[cursor] == "." and dot_ok)
            ):
                if line[cursor] == ".":
                    dot_ok = False
                cursor += 1
        elif f.ftype == FieldType.DATE:
            seg = line[cursor:cursor + 10]
            if len(seg) < 10 or not _DATE_RE.fullmatch(seg):
                return [None] * len(values), False
            import datetime

            try:
                values[out_idx[i]] = datetime.date(
                    int(seg[0:4]), int(seg[5:7]), int(seg[8:10])
                )
            except ValueError:  # calendar-invalid (incl. year 0)
                return [None] * len(values), False
            cursor += 10
        elif f.ftype == FieldType.CHR:
            if line[cursor] == f.target:
                values[out_idx[i]] = f.target
                cursor += 1
            else:
                return [None] * len(values), False
            if f.repeat:
                while cursor < n and line[cursor] == f.target:
                    cursor += 1
        elif f.ftype == FieldType.STR:
            if f.stop == StrStop.NCHAR:
                nchar = f.nchar
            elif f.stop == StrStop.DELIM:
                nchar = 0
                while (
                    cursor + nchar < n and line[cursor + nchar] != f.delim
                ):
                    nchar += 1
            else:  # ANY_WS
                nchar = 0
                while (
                    cursor + nchar < n
                    and line[cursor + nchar] not in C_WHITESPACE
                ):
                    nchar += 1
            values[out_idx[i]] = line[cursor : cursor + nchar]
            cursor += nchar  # may exceed n for NCHAR => malformed below
        elif f.ftype == FieldType.WS:
            while cursor < n and line[cursor] in WS_NO_NEWLINE:
                cursor += 1

    if cursor != n:
        return [None] * len(values), False
    return values, True


def parse_line_bytes(line, spec: FormatSpec) -> tuple[list, bool]:
    """BYTE-semantics parse — the reference's exact contract
    (``parsing_basics.cpp:41-69`` walks ``char*``, so NCHAR counts
    BYTES, not codepoints). Accepts ``bytes`` or ``str`` (encoded UTF-8
    first).

    Implementation: the latin-1 trick. Decoding bytes as latin-1 maps
    every byte to exactly one codepoint (0x00-0xFF), so running the
    codepoint walker on that string IS the byte walker — every cursor
    comparison against ASCII digits/whitespace/targets behaves
    identically (continuation bytes >= 0x80 never equal them), and NCHAR
    counts bytes. Captured STR/CHR values are then re-encoded latin-1
    (recovering the raw bytes) and decoded UTF-8 with ``replace``: a
    capture whose NCHAR boundary split a multi-byte sequence carries
    U+FFFD where the reference would emit the raw split bytes — which a
    UTF-8 string column cannot represent; the replacement char is the
    deterministic stand-in (documented contract).

    For pure-ASCII input this returns exactly what :func:`parse_line`
    returns; for specs where ``FormatSpec.byte_sensitive()`` is False
    the two agree on ANY valid-UTF-8 input (see that docstring's proof
    sketch). Non-ASCII CHR targets / STR delimiters are rejected: the
    reference compiler reads single BYTES there, so such specs already
    compile differently and have no meaningful parity."""
    for f in spec.fields:
        if f.ftype == FieldType.CHR and f.target and ord(f.target) > 127:
            raise ValueError("byte-mode needs ASCII CHR targets")
        if (f.ftype == FieldType.STR and f.stop == StrStop.DELIM
                and f.delim != "\0" and ord(f.delim) > 127):
            raise ValueError("byte-mode needs ASCII STR delimiters")
    b = line.encode("utf-8") if isinstance(line, str) else bytes(line)
    values, wf = parse_line(b.decode("latin-1"), spec)
    out = [
        v.encode("latin-1").decode("utf-8", errors="replace")
        if isinstance(v, str) else v
        for v in values
    ]
    return out, wf


def split_lines(text: str) -> list[str]:
    """Split a document payload into lines the way the reference reads a
    file: split on ``\\n``, then strip exactly one trailing ``\\r`` from each
    line — including the final EOF line without a newline
    (filtered_file_reader.cpp:149-166); a trailing newline does not create
    an extra empty line."""
    lines = text.split("\n")
    if len(lines) > 1 and lines[-1] == "":
        lines.pop()
    return [l[:-1] if l.endswith("\r") else l for l in lines]


# ──────────────────────────────────────────────────────────────────────
# Filter AST evaluation (oracle side). The AST classes themselves live in
# operators/filters.py (shared, Spark-free dataclasses); this module only
# provides row-wise evaluation.
# ──────────────────────────────────────────────────────────────────────


def _ascii_lower(s: str) -> str:
    """C ``tolower`` per char: ASCII-only, leaves everything else alone."""
    return "".join(
        chr(ord(c) + 32) if "A" <= c <= "Z" else c for c in s
    )


_CMP_OPS = {
    "EQ": lambda a, b: a == b,
    "ST": lambda a, b: a < b,
    "SE": lambda a, b: a <= b,
    "GT": lambda a, b: a > b,
    "GE": lambda a, b: a >= b,
    "CT": lambda a, b: b in a,
    "BW": lambda a, b: a.startswith(b),
    "EW": lambda a, b: a.endswith(b),
}


@dataclass
class OracleLine:
    """The oracle's ProcessedLine: raw text + parse result + per-doc id."""

    raw_line: str
    line_num: int
    values: list
    well_formed: bool


def eval_filter(node, line: OracleLine, spec: FormatSpec) -> Optional[bool]:
    """Evaluate a filter AST node (operators.filters classes) on one line.

    Mirrors CombinedFilter/FieldFilter/_passes dispatch including the
    invert-via-XOR wrapper (line_filter.hpp:31-39).

    Returns ``None`` (SQL NULL, Kleene logic) when a compared field is unset
    on a well-formed line — the reference reads uninitialized memory there
    (parsing_data allocates, never zeroes); NULL-propagation is our
    deterministic stand-in and matches the Spark column semantics exactly.
    """
    from ..operators.filters import (
        CombinedFilter,
        FieldFilter,
        LineNumberFilter,
        RawLineFilter,
    )

    if isinstance(node, CombinedFilter):
        left = eval_filter(node.left, line, spec)
        right = None
        # Reference short-circuit (line_filter.cpp:22-27) — observable only
        # through evaluation cost, never through the result; evaluate the
        # right side lazily where the result is already decided.
        if left is True and node.op == "OR":
            r = True
        elif left is False and node.op == "AND":
            r = False
        elif left is True and node.op == "NOR":
            r = False
        else:
            right = eval_filter(node.right, line, spec)
            if node.op == "AND":  # Kleene AND
                r = (
                    False
                    if (left is False or right is False)
                    else (None if (left is None or right is None) else True)
                )
            elif node.op == "OR":  # Kleene OR
                r = (
                    True
                    if (left is True or right is True)
                    else (None if (left is None or right is None) else False)
                )
            elif node.op == "XOR":
                r = None if (left is None or right is None) else (left != right)
            else:  # NOR = NOT(OR)
                if left is True or right is True:
                    r = False
                elif left is None or right is None:
                    r = None
                else:
                    r = True
    elif isinstance(node, FieldFilter):
        loc = spec.field_by_name(node.field)
        if loc is None:
            raise ValueError(f"no field named {node.field}")
        i, f = loc
        out_idx = {j: k for k, (j, _) in enumerate(spec.output_fields())}
        val = line.values[out_idx[i]]
        cmp = node.cmp
        if val is None:
            r = None
        elif f.ftype == FieldType.INT:
            r = _CMP_OPS[cmp](val, int(node.value))
        elif f.ftype == FieldType.DBL:
            r = _CMP_OPS[cmp](val, float(node.value))
        elif f.ftype == FieldType.DATE:
            import datetime

            r = _CMP_OPS[cmp](val, datetime.date.fromisoformat(node.value))
        elif f.ftype == FieldType.CHR:
            r = _CMP_OPS[cmp](val, node.value[0] if node.value else "\0")
        else:
            fv, bv = val, node.value
            if node.case_insensitive:
                fv, bv = _ascii_lower(fv), _ascii_lower(bv)
            r = _CMP_OPS[cmp](fv, bv)
    elif isinstance(node, LineNumberFilter):
        r = node.lo <= line.line_num <= node.hi
    elif isinstance(node, RawLineFilter):
        r = node.substr in line.raw_line
    else:
        raise TypeError(f"unknown filter node {type(node)}")

    if r is None:
        return None
    return r != node.inverted


def accepts(
    node: Optional[object],
    line: OracleLine,
    spec: FormatSpec,
    accept_bad_format: bool = True,
) -> bool:
    """The scan acceptance rule (filtered_file_reader.cpp:258-262).
    NULL filter verdicts (unset fields) do not route — same as Spark's
    ``df.filter`` dropping NULL."""
    if not line.well_formed:
        return accept_bad_format
    return node is None or eval_filter(node, line, spec) is True
