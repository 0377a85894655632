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

        # INT typing + int64 saturation routing (>18 digits -> walker)
        for i, f in spec.output_fields():
            kk = self.out_pos[i]
            if f.ftype == FieldType.INT:
                tok = sub_children[kk]
                short = pc.fill_null(
                    pc.less_equal(pc.binary_length(tok), 18), False
                )
                ok = pc.and_(ok, short)
                tok = pc.if_else(short, tok, pa.scalar(None, pa.string()))
                sub_children[kk] = tok.cast(pa.int64())

        # scatter the matched-subset results back to full row space
        m_np = m.to_numpy(zero_copy_only=False)
        ok_np = ok.to_numpy(zero_copy_only=False)
        valid_np = m_np.copy()
        valid_np[m_np] = ok_np
        valid = pa.array(valid_np)
        m_mask = pa.array(m_np)

        children: dict[int, pa.Array] = {}
        for i, f in spec.output_fields():
            kk = self.out_pos[i]
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
