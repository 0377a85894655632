"""Round-4b batch 2: HITS hubs/authorities, Luhn-validated CC scrub,
positional proximity search — each pinned against an independent
pure-Python recomputation."""

from __future__ import annotations

SCALE = 1_000_000


def _hits_py(edges, iters=3):
    edges = sorted(set(edges))
    verts = sorted({u for u, _ in edges} | {v for _, v in edges})
    hub = {v: SCALE for v in verts}
    auth = {}
    for _ in range(iters):
        raw_a = {v: 0 for v in verts}
        for u, v in edges:
            raw_a[v] += hub[u]
        amax = max(list(raw_a.values()) + [0]) or 1
        auth = {v: raw_a[v] * SCALE // amax for v in verts}
        raw_h = {v: 0 for v in verts}
        for u, v in edges:
            raw_h[u] += auth[v]
        hmax = max(list(raw_h.values()) + [0]) or 1
        hub = {v: raw_h[v] * SCALE // hmax for v in verts}
    return {v: (auth[v], hub[v]) for v in verts}


def test_host_hits_matches_python(spark):
    from logparser_spark.operators.weburl import host_hits

    edges = [
        ("hub1", "authA"), ("hub1", "authB"), ("hub1", "authC"),
        ("hub2", "authA"), ("hub2", "authB"),
        ("authA", "authB"),          # authorities can link too
        ("lone", "authC"),
        ("hub1", "authA"),           # multi-edge collapses
        ("selfy", "selfy"),          # self-loop is a real vertex
    ]
    df = spark.createDataFrame(edges, ["src_host", "dst_host"])
    got = {r.host: (r.authority, r.hub)
           for r in host_hits(df, iters=3).collect()}
    assert got == _hits_py(edges, iters=3)
    # directional sanity: the 3-outlink hub out-hubs everyone; the
    # doubly-cited authority out-scores the lone-cited one
    assert got["hub1"][1] == SCALE
    assert got["authA"][0] > got["authC"][0]
    assert got["lone"][0] == 0  # nothing points at it


def _luhn_ok(digits: str) -> bool:
    s = 0
    n = len(digits)
    for i, ch in enumerate(digits, 1):
        v = int(ch)
        if (n - i) % 2 == 1:
            v *= 2
            if v > 9:
                v -= 9
        s += v
    return s % 10 == 0


def test_luhn_scrub_masks_only_valid(spark):
    from logparser_spark.operators.textstats import luhn_cc_scrub

    valid_sp = "4111 1111 1111 1111"
    invalid_sp = "4111 1111 1111 1112"
    valid_dash = "5500-0000-0000-0004"
    short = "1234 5678"
    assert _luhn_ok(valid_sp.replace(" ", ""))
    assert not _luhn_ok(invalid_sp.replace(" ", ""))
    rows = [
        (1, f"pay {valid_sp} or {invalid_sp} end"),
        (2, f"card {valid_dash} ok"),
        (3, f"just {short} digits"),
        (4, "no numbers at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in luhn_cc_scrub(df).collect()}
    assert (got[1].n_cc_candidates, got[1].n_cc_valid) == (2, 1)
    assert got[1].scrubbed == f"pay [CC] or {invalid_sp} end"
    assert (got[2].n_cc_candidates, got[2].n_cc_valid) == (1, 1)
    assert got[2].scrubbed == "card [CC] ok"
    # 8 digits is below the 13-digit candidate floor
    assert (got[3].n_cc_candidates, got[3].n_cc_valid) == (0, 0)
    assert got[3].scrubbed == rows[2][1]
    assert got[4].scrubbed == rows[3][1]


def test_luhn_scrub_nineteen_digit_boundary(spark):
    """19 digits is the longest candidate (PAN max); a 20-digit run
    must not be masked whole."""
    from logparser_spark.operators.textstats import luhn_cc_scrub

    d19 = "6" * 18 + "?"  # find the check digit making 19 6s valid
    for c in "0123456789":
        if _luhn_ok("6" * 18 + c):
            d19 = "6" * 18 + c
            break
    df = spark.createDataFrame(
        [(1, f"x {d19} y"), (2, "x " + "6" * 20 + " y")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in luhn_cc_scrub(df).collect()}
    assert got[1].scrubbed == "x [CC] y"
    assert "6" * 20 in got[2].scrubbed or got[2].n_cc_valid == 0


def test_proximity_search_counts_pairs(spark):
    from logparser_spark.operators.invindex import (
        build_inverted_index,
        proximity_search,
    )

    rows = [
        (1, "spark x table"),            # gap 2: one pair at slop>=2
        (2, "spark x y z table"),        # gap 4: outside slop 3
        (3, "table spark"),              # wrong order: not a pair
        (4, "spark table spark x table"),
        (5, "spark spark table"),        # two a-positions, one b
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    idx = build_inverted_index(df)
    got = {r.doc_id: r.n_pairs
           for r in proximity_search(idx, "spark", "table", 3).collect()}

    def brute(t, slop=3):
        w = t.split(" ")
        return sum(
            1
            for i, a in enumerate(w) if a == "spark"
            for j, b in enumerate(w) if b == "table"
            and i < j <= i + slop
        )

    expected = {i: brute(t) for i, t in rows}
    expected = {i: n for i, n in expected.items() if n > 0}
    assert got == expected
    assert 2 not in got and 3 not in got
    assert got[4] == 2  # (0,1) and (2,4)
    assert got[5] == 2
