"""Capture-free tier-1 kernel: RE2 DFA gate + split decomposition.

``pc.extract_regex`` is the parse kernel's dominant cost (77% of kernel
time, BENCH/BASELINE.md): RE2 answers *does it match* with its DFA (~7M
rows/s/core measured here) but must fall back to the much slower
NFA/bitstate engine to materialize capture groups (~0.9M rows/s/core —
and dropping 6 of 8 groups only saved 12%, so the cost is the capture
ENGINE, not the group count). This module removes captures from the hot
path entirely for a recognized family of specs:

1. gate every line with ``match_substring_regex`` against the SAME
   provably-sound flat regex (``FormatSpec.to_fast_regex``) — structural
   validation at DFA speed;
2. decompose only the matched rows with capture-free Arrow kernels
   (``split_pattern`` on the anchor char, ``ascii_split_whitespace``,
   ``utf8_ltrim``/``rtrim``) — plain byte scans, no regex engine;
3. cheap per-row alignment checks route the rare rows where the split
   boundaries could disagree with the regex captures to the exact
   walker tiers (never silently wrong — see the soundness note).

Recognized spec family (``compile_split_plan`` returns None otherwise,
and the caller keeps the extract_regex path)::

    tokens? sep? anchor? tail?
    tokens := (INT | STR_ANY_WS) (WS (INT | STR_ANY_WS))*
    sep    := WS                      (required before anchor if tokens)
    anchor := CHR(a) CHR(b,repeat)? STR_DELIM(a) CHR(a)
    tail   := WS? STR_DELIM('\\0')

which covers the default format
``{INT:Date} {INT:Time} {STR:Level} :{CHR:,.,1}{STR:Source}: {STR:Mesg}``
and the general "ws-separated header + delimited middle + free tail"
log shape.

Soundness (why split boundaries == regex captures on accepted rows):
the gate guarantees the line matches the anchored flat pattern, so the
structural shape exists; only the ALIGNMENT of the first anchor-char
occurrence is in question. The first ``a`` in the line is the
structural ``CHR(a)`` iff no earlier token contains ``a``; if one
does, either the pre-anchor text fails the "ends with whitespace"
check (an ``a`` inside a token is preceded by non-ws) or the
whitespace-split token count differs from the spec's — both checks
route the row to the walker. Tokens themselves cannot contain
whitespace (INT is a digit run into mandatory WS; ANY_WS stops at ws),
so the whitespace split reproduces them exactly. Within the middle
segment the regex's greedy ``b*`` run and ``[^a\\n]*`` capture are
exactly ``ltrim(b)`` and "text before the next ``a``" (``STR_DELIM(a)``
can never contain ``a``; ``max_splits`` keeps later ``a``s in the
tail). The tail's mandatory ``WS+`` makes ``ltrim(ws)`` exact, and in
the no-anchor shape the k whitespace separators are all mandatory, so
``ascii_split_whitespace(max_splits=k)`` lands the remainder exactly
where the regex puts the EOL capture. INT tokens with >18 digits route
to the walker (the int64 saturation contract). Differentially
fuzz-tested against the extract_regex kernel in
tests/test_fastsplit.py.
"""

from __future__ import annotations

from typing import Optional

from ..functions.formats import (
    WS_NO_NEWLINE,
    FieldSpec,
    FieldType,
    FormatSpec,
    StrStop,
)

_WS = WS_NO_NEWLINE
_DIGITS = "0123456789"


def _is_tok(f: FieldSpec) -> bool:
    return f.ftype == FieldType.INT or (
        f.ftype == FieldType.STR and f.stop == StrStop.ANY_WS
    )


def _guarded_elements(toks, positions: list[int]):
    """list_element for each position, null where the row's list is too
    short (list_element raises on short lists). Fast path: when every
    row is long enough, plain list_element; else one flatten + takes."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    need = max(positions) + 1
    lens = pc.list_value_length(toks)
    n = len(toks)
    minlen = int(pc.min(lens).as_py() or 0) if n else 0
    if n and minlen >= need:
        return [pc.list_element(toks, j) for j in positions]
    tc = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offs = np.frombuffer(tc.buffers()[1], dtype=np.int32)[
        tc.offset: tc.offset + n + 1
    ].astype(np.int64)
    flat = tc.flatten()
    lens_np = offs[1:] - offs[:-1]
    out = []
    for j in positions:
        has = lens_np > j
        idx = np.where(has, offs[:-1] + j, 0)
        col = flat.take(pa.array(idx, type=pa.int64()))
        col = pc.if_else(pa.array(has), col, pa.scalar(None, pa.string()))
        out.append(col)
    return out


class SplitPlan:
    """Compiled decomposition for one spec. ``run(arr, rx)`` returns
    (children, valid): one FULL-LENGTH typed pa.Array per output field
    (int64 for INT, string for CHR/STR — CHR filled with its constant
    target) and a boolean validity array. Rows with valid=False may
    carry garbage split-side values — the caller MUST mask children
    with ``valid`` (``_batch_parse_arrow`` does) and resolve those rows
    in the walker tiers."""

    def __init__(self, spec: FormatSpec, tok_idx: list[int],
                 anchor: str | None, dot: str | None,
                 src_idx: int | None, tail_idx: int | None, tail_ws: bool):
        self.spec = spec
        self.tok_idx = tok_idx
        self.anchor = anchor
        self.dot = dot
        self.src_idx = src_idx
        self.tail_idx = tail_idx
        self.tail_ws = tail_ws
        self.out_pos = {i: k for k, (i, _) in enumerate(spec.output_fields())}

    def run(self, arr, rx: str):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        n = len(arr)
        spec = self.spec
        m = pc.fill_null(pc.match_substring_regex(arr, pattern=rx), False)
        sub = arr.filter(m)
        n_sub = len(sub)
        ok = pa.array(np.ones(n_sub, dtype=bool))
        sub_children: dict[int, pa.Array] = {}
        k = len(self.tok_idx)

        if self.anchor is not None:
            # every sub row matched the gate, so >= 2 anchor chars exist
            # and the 3-way split is total
            parts = pc.split_pattern(sub, pattern=self.anchor, max_splits=2)
            head = pc.list_element(parts, 0)
            mid = pc.list_element(parts, 1)
            tail = pc.list_element(parts, 2)

            if k:
                hr = pc.utf8_rtrim(head, characters=_WS)
                # alignment check 1: text before the first anchor char
                # ends in whitespace (the spec's mandatory WS separator)
                # — an anchor char INSIDE a token is preceded by non-ws
                ok = pc.and_(ok, pc.not_equal(hr, head))
                toks = pc.ascii_split_whitespace(hr)
                # alignment check 2: exactly the spec's token count
                ok = pc.and_(ok, pc.equal(pc.list_value_length(toks), k))
                cols = _guarded_elements(toks, list(range(k)))
                for j, fi in enumerate(self.tok_idx):
                    sub_children[self.out_pos[fi]] = cols[j]
            else:
                # spec starts at the anchor: nothing precedes it
                ok = pc.and_(ok, pc.equal(head, ""))

            if self.dot is not None:
                # CHR(b) is mandatory width: the run char must open the
                # middle segment
                ok = pc.and_(ok, pc.starts_with(mid, pattern=self.dot))
                src = pc.utf8_ltrim(mid, characters=self.dot)
            else:
                src = mid
            if self.src_idx is not None:
                sub_children[self.out_pos[self.src_idx]] = src

            if self.tail_idx is not None:
                if self.tail_ws:
                    lt = pc.utf8_ltrim(tail, characters=_WS)
                    # the gate makes WS+ before the tail mandatory
                    ok = pc.and_(ok, pc.not_equal(lt, tail))
                    sub_children[self.out_pos[self.tail_idx]] = lt
                else:
                    sub_children[self.out_pos[self.tail_idx]] = tail
            else:
                # spec ends at the closing anchor char
                ok = pc.and_(ok, pc.equal(tail, ""))
        else:
            # no anchor: pure ws-token shape, optionally with an EOL
            # tail. All k separators are mandatory WS+ in the gate, so
            # max_splits=k lands the remainder exactly at the regex's
            # EOL capture.
            if self.tail_idx is not None:
                toks = pc.ascii_split_whitespace(sub, max_splits=k)
                want = k + 1
            else:
                toks = pc.ascii_split_whitespace(sub)
                want = k
            ok = pc.and_(ok, pc.equal(pc.list_value_length(toks), want))
            pos = list(range(k)) + ([k] if self.tail_idx is not None else [])
            cols = _guarded_elements(toks, pos)
            for j, fi in enumerate(self.tok_idx):
                sub_children[self.out_pos[fi]] = cols[j]
            if self.tail_idx is not None:
                sub_children[self.out_pos[self.tail_idx]] = cols[k]

        # INT typing + saturation routing + scatter (shared epilogue)
        return _type_and_scatter(
            spec, self.out_pos, n, m, ok, sub_children, n_sub
        )


def _type_and_scatter(spec, out_pos, n, m, ok, sub_children, n_sub):
    """Shared epilogue for both plan kinds: int64-type the INT columns
    (>18-digit runs routed to the walker per the saturation contract),
    then scatter the matched-subset results back to full row space.
    Returns (children, valid)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for i, f in spec.output_fields():
        kk = out_pos[i]
        if f.ftype == FieldType.INT:
            tok = sub_children[kk]
            short = pc.fill_null(
                pc.less_equal(pc.binary_length(tok), 18), False
            )
            ok = pc.and_(ok, short)
            tok = pc.if_else(short, tok, pa.scalar(None, pa.string()))
            sub_children[kk] = tok.cast(pa.int64())

    m_np = m.to_numpy(zero_copy_only=False)
    ok_np = ok.to_numpy(zero_copy_only=False)
    valid_np = m_np.copy()
    valid_np[m_np] = ok_np
    valid = pa.array(valid_np)
    m_mask = pa.array(m_np)

    children: dict[int, pa.Array] = {}
    for i, f in spec.output_fields():
        kk = out_pos[i]
        if f.ftype == FieldType.CHR:
            # a matched CHR capture is its constant target char
            children[kk] = pc.if_else(
                valid, pa.scalar(f.target, pa.string()),
                pa.scalar(None, pa.string()),
            )
            continue
        typ = pa.int64() if f.ftype == FieldType.INT else pa.string()
        base = pa.nulls(n, type=typ)
        if n_sub:
            ch = sub_children[kk]
            if isinstance(ch, pa.ChunkedArray):
                ch = ch.combine_chunks()
            base = pc.replace_with_mask(base, m_mask, ch)
        children[kk] = base
    return children, valid


class SeqPlan:
    """Generalized capture-free decomposition: the spec compiled to a
    SEQUENCE of cheap byte-scan ops applied left-to-right to a shrinking
    ``rest`` array. Covers multi-anchor shapes the single-anchor
    ``SplitPlan`` cannot (brackets ``[{STR:T}] {STR:L}: {STR:M}``,
    repeated delimiters ``{STR:A}: {STR:B}: {STR:C}``, glued literals
    ``{INT:Pid}@{STR:Host}``).

    Soundness is SIMPLER than SplitPlan's: because tokens are carved by
    whitespace splits BEFORE any anchor-char split runs, the "anchor
    char inside a token" misalignment cannot arise — each op consumes
    exactly what the walker would at the same position, by induction:

    - ``ws``: the gate emits every WS as ``+`` (to_fast_regex pass A),
      so ltrim-all == the walker's maximal ws consumption; the
      changed-check routes zero-width rows to the walker.
    - ``lit(c)``/``run(b)``: fixed CHR / maximal char-run — starts-with
      check + trim, byte-exact both semantics.
    - ``upto(c)``: a ``STR_DELIM(c)`` field can never contain ``c``, so
      the first ``c`` in ``rest`` IS the structural closing CHR;
      ``split_pattern(max_splits=1)`` lands exactly there. Rows with no
      remaining ``c`` (only reachable off the gate-proven path) fail
      the 2-part check and route to the walker.
    - ``toks_ws``/``toks_end``/``toks_lit``: INT/ANY_WS tokens cannot
      contain whitespace, so the ws-split boundaries reproduce them
      exactly; the element-count check routes every structural surprise
      (including Arrow's leading/trailing-empty split artifacts) to the
      walker. ``toks_lit`` (group glued to a literal, ``{INT:A}:``)
      requires all-INT tokens with the literal outside the digit/ws
      sets, so the first occurrence is provably structural.

    Rejected (→ extract_regex path): NCHAR fields (keeps the family
    non-byte-sensitive), DBL (no fast regex at all), non-ASCII /
    newline targets and delims, ``STR_DELIM(c)`` closed by a repeat
    CHR(c) (walker consumes the whole run, upto only one char).

    Per-op trims/splits copy the shrinking tail, so for the
    single-anchor family ``SplitPlan`` (one 3-way split, ~2 copies) is
    kept as the preferred compilation — ``compile_any_split_plan``
    tries it first.
    """

    def __init__(self, spec: FormatSpec, ops: list):
        self.spec = spec
        self.ops = ops
        self.out_pos = {i: k for k, (i, _) in enumerate(spec.output_fields())}

    def run(self, arr, rx: str):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        n = len(arr)
        m = pc.fill_null(pc.match_substring_regex(arr, pattern=rx), False)
        sub = arr.filter(m)
        n_sub = len(sub)
        ok = pa.array(np.ones(n_sub, dtype=bool))
        sub_children: dict[int, pa.Array] = {}
        rest = sub
        consumed_all = False

        def chk(b):
            return pc.fill_null(b, False)

        for op in self.ops:
            kind = op[0]
            if kind == "ws":
                lt = pc.utf8_ltrim(rest, characters=_WS)
                ok = pc.and_(ok, chk(pc.not_equal(lt, rest)))
                rest = lt
            elif kind == "run":
                b = op[1]
                ok = pc.and_(ok, chk(pc.starts_with(rest, pattern=b)))
                rest = pc.utf8_ltrim(rest, characters=b)
            elif kind == "lit":
                c = op[1]
                ok = pc.and_(ok, chk(pc.starts_with(rest, pattern=c)))
                rest = pc.utf8_slice_codeunits(rest, start=1)
            elif kind == "upto":
                c, fi = op[1], op[2]
                parts = pc.split_pattern(rest, pattern=c, max_splits=1)
                ok = pc.and_(
                    ok, chk(pc.equal(pc.list_value_length(parts), 2))
                )
                head, rest = _guarded_elements(parts, [0, 1])
                sub_children[self.out_pos[fi]] = head
            elif kind == "toks_lit":
                toks, c = op[1], op[2]
                parts2 = pc.split_pattern(rest, pattern=c, max_splits=1)
                ok = pc.and_(
                    ok, chk(pc.equal(pc.list_value_length(parts2), 2))
                )
                head, rest = _guarded_elements(parts2, [0, 1])
                toks_arr = pc.ascii_split_whitespace(head)
                ok = pc.and_(
                    ok,
                    chk(pc.equal(pc.list_value_length(toks_arr), len(toks))),
                )
                cols = _guarded_elements(toks_arr, list(range(len(toks))))
                for j, fi in enumerate(toks):
                    sub_children[self.out_pos[fi]] = cols[j]
            elif kind == "toks_ws":
                toks = op[1]
                k = len(toks)
                parts = pc.ascii_split_whitespace(rest, max_splits=k)
                ok = pc.and_(
                    ok, chk(pc.equal(pc.list_value_length(parts), k + 1))
                )
                cols = _guarded_elements(parts, list(range(k + 1)))
                for j, fi in enumerate(toks):
                    sub_children[self.out_pos[fi]] = cols[j]
                rest = cols[k]
            elif kind == "toks_end":
                toks = op[1]
                k = len(toks)
                parts = pc.ascii_split_whitespace(rest)
                ok = pc.and_(
                    ok, chk(pc.equal(pc.list_value_length(parts), k))
                )
                cols = _guarded_elements(parts, list(range(k)))
                for j, fi in enumerate(toks):
                    sub_children[self.out_pos[fi]] = cols[j]
                consumed_all = True
            else:  # "eol"
                sub_children[self.out_pos[op[1]]] = rest
                consumed_all = True

        if not consumed_all:
            ok = pc.and_(ok, chk(pc.equal(rest, "")))
        return _type_and_scatter(
            self.spec, self.out_pos, n, m, ok, sub_children, n_sub
        )


def _ok_char(c: Optional[str]) -> bool:
    return bool(c) and len(c) == 1 and ord(c) < 128 and c != "\n"


def compile_seq_plan(spec: FormatSpec):
    """Compile the sequential op list, or None when a field falls
    outside the family (NCHAR, DBL, non-ASCII/newline chars, delim
    closed by a repeat run, token group glued to a non-INT-safe
    literal)."""
    if spec.to_fast_regex() is None:
        return None
    f = spec.fields
    n = len(f)
    ops: list = []
    i = 0
    while i < n:
        fd = f[i]
        if fd.ftype == FieldType.WS:
            if not (ops and ops[-1][0] == "ws"):
                ops.append(("ws",))
            i += 1
        elif fd.ftype == FieldType.CHR:
            if not _ok_char(fd.target):
                return None
            ops.append(("run", fd.target) if fd.repeat
                       else ("lit", fd.target))
            i += 1
        elif fd.ftype == FieldType.STR and fd.stop == StrStop.DELIM \
                and fd.delim == "\0":
            if i != n - 1:
                return None
            ops.append(("eol", i))
            i += 1
        elif fd.ftype == FieldType.STR and fd.stop == StrStop.DELIM:
            # must be closed by a NON-repeat CHR on the same char (a
            # repeat closer consumes a whole run; upto eats only one)
            if not (i + 1 < n and f[i + 1].ftype == FieldType.CHR
                    and not f[i + 1].repeat
                    and f[i + 1].target == fd.delim
                    and _ok_char(fd.delim)):
                return None
            ops.append(("upto", fd.delim, i))
            i += 2
        elif _is_tok(fd):
            toks = [i]
            i += 1
            while i + 1 < n and f[i].ftype == FieldType.WS \
                    and _is_tok(f[i + 1]):
                toks.append(i + 1)
                i += 2
            if i >= n:
                ops.append(("toks_end", toks))
            elif f[i].ftype == FieldType.WS:
                # consumes the tokens AND the following mandatory ws;
                # if the spec ends here the epilogue's rest == "" check
                # closes it
                ops.append(("toks_ws", toks))
                i += 1
            elif f[i].ftype == FieldType.CHR and not f[i].repeat:
                c = f[i].target
                if not _ok_char(c) or c in _WS or c in _DIGITS:
                    return None
                if any(f[t].ftype != FieldType.INT for t in toks):
                    # an ANY_WS token could contain the literal; only
                    # all-INT groups are provably first-occurrence-safe
                    return None
                ops.append(("toks_lit", toks, c))
                i += 1
            else:
                return None
        else:
            return None  # NCHAR / DBL / unknown
    return SeqPlan(spec, ops)


def compile_any_split_plan(spec: FormatSpec):
    """Best capture-free plan for the spec: the single-anchor
    ``SplitPlan`` when its (fewer-copies) family matches, else the
    generalized sequential plan, else None (extract_regex path)."""
    plan = compile_split_plan(spec)
    if plan is not None:
        return plan
    return compile_seq_plan(spec)


def compile_split_plan(spec: FormatSpec):
    """Recognize the spec family above; None if not expressible (the
    caller keeps the extract_regex kernel). Requires the provably-sound
    flat regex to exist — it is the gate that carries ALL structural
    validation."""
    if spec.to_fast_regex() is None:
        return None
    f = spec.fields
    n = len(f)
    i = 0
    tok_idx: list[int] = []
    if i < n and _is_tok(f[i]):
        tok_idx.append(i)
        i += 1
        while i + 1 < n and f[i].ftype == FieldType.WS and _is_tok(f[i + 1]):
            tok_idx.append(i + 1)
            i += 2
    sep_ws = False
    if i < n and f[i].ftype == FieldType.WS:
        sep_ws = True
        i += 1

    anchor = dot = None
    src_idx = None
    if (i < n and f[i].ftype == FieldType.CHR and not f[i].repeat
            and f[i].target and ord(f[i].target) < 128
            and f[i].target not in _WS and f[i].target not in _DIGITS
            and f[i].target != "\n"):
        if tok_idx and not sep_ws:
            # without the mandatory WS before the anchor the
            # "ends-with-ws" alignment check has no teeth: a token
            # containing the anchor char could silently misalign
            return None
        a = f[i].target
        i += 1
        if i < n and f[i].ftype == FieldType.CHR and f[i].repeat:
            b = f[i].target
            if not b or b == a or ord(b) > 127:
                return None
            dot = b
            i += 1
        if not (i < n and f[i].ftype == FieldType.STR
                and f[i].stop == StrStop.DELIM and f[i].delim == a):
            return None
        src_idx = i
        i += 1
        if not (i < n and f[i].ftype == FieldType.CHR and not f[i].repeat
                and f[i].target == a):
            return None
        i += 1
        anchor = a
        sep_ws = False
        if i < n and f[i].ftype == FieldType.WS:
            sep_ws = True
            i += 1

    tail_idx = None
    if (i < n and f[i].ftype == FieldType.STR
            and f[i].stop == StrStop.DELIM and f[i].delim == "\0"):
        tail_idx = i
        i += 1
    elif sep_ws and anchor is None:
        return None  # lone trailing WS after tokens: keep the regex path
    elif sep_ws:
        return None

    if i != n:
        return None
    if anchor is None:
        if not tok_idx:
            return None  # nothing recognizable / single EOL field
        if tail_idx is not None and not sep_ws:
            # tail must be separated from the last token by WS, else the
            # whitespace split cannot reproduce the boundary
            return None
    return SplitPlan(spec, tok_idx, anchor, dot, src_idx, tail_idx,
                     sep_ws if anchor is None else sep_ws)
