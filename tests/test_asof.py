"""As-of join semantics, pinned against hand-computed expectations and
the properties that distinguish as-of from ordinary joins: backward
match, exact-timestamp inclusion, NULL before the first right row,
per-key isolation, and deterministic tiebreak on duplicate right
timestamps."""

import pytest

from logparser_spark.operators.asof import asof_join


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            # key, ts, event
            ("a", 5, "e1"),   # between r@3 and r@8  -> r@3
            ("a", 8, "e2"),   # exactly at r@8       -> r@8 (inclusive)
            ("a", 2, "e3"),   # before first right   -> NULL
            ("a", 100, "e4"), # after last right     -> r@8
            ("b", 7, "e5"),   # key isolation: only b rows visible
            ("c", 7, "e6"),   # key with no right rows at all
        ],
        "key string, ts long, event string",
    )
    right = spark.createDataFrame(
        [
            ("a", 3, "v3", 30),
            ("a", 8, "v8", 80),
            ("b", 1, "w1", 10),
            ("b", 9, "w9", 90),  # in the future for e5
        ],
        "key string, ts long, val string, num int",
    )
    return left, right


def test_backward_match_and_edges(frames):
    left, right = frames
    out = asof_join(left, right, on="key", left_ts="ts", right_ts="ts")
    got = {r["event"]: (r["val"], r["num"], r["asof_ts"])
           for r in out.collect()}
    assert got == {
        "e1": ("v3", 30, 3),
        "e2": ("v8", 80, 8),
        "e3": (None, None, None),
        "e4": ("v8", 80, 8),
        "e5": ("w1", 10, 1),
        "e6": (None, None, None),
    }


def test_left_columns_pass_through(frames):
    left, right = frames
    out = asof_join(left, right, on="key")
    assert out.columns == ["key", "ts", "event", "asof_ts", "val", "num"]
    assert out.count() == left.count()


def test_value_cols_subset(frames):
    left, right = frames
    out = asof_join(left, right, on="key", value_cols=["num"])
    assert out.columns == ["key", "ts", "event", "asof_ts", "num"]
    assert {r["event"]: r["num"] for r in out.collect()}["e1"] == 30


def test_duplicate_right_ts_tiebreak(spark):
    left = spark.createDataFrame(
        [("a", 10, "e")], "key string, ts long, event string"
    )
    right = spark.createDataFrame(
        [("a", 10, "first"), ("a", 10, "second")],
        "key string, ts long, val string",
    )
    out = asof_join(
        left, right, on="key", tiebreak_cols=["val"]
    )
    # the LAST right row in tiebreak order wins (max matching row,
    # DuckDB's rule)
    assert out.collect()[0]["val"] == "second"


def test_null_right_value_not_inherited(spark):
    """A right row whose value column is genuinely NULL must still win
    the as-of match — its NULL must NOT be papered over by an older
    right row's non-NULL value (the per-column last() bug)."""
    left = spark.createDataFrame(
        [("a", 10, "e1"), ("a", 25, "e2")],
        "key string, ts long, event string",
    )
    right = spark.createDataFrame(
        [("a", 5, "old", 1), ("a", 20, None, None)],
        "key string, ts long, val string, num int",
    )
    got = {r["event"]: (r["val"], r["num"], r["asof_ts"])
           for r in asof_join(left, right, on="key").collect()}
    # e1 matches r@5; e2 matches r@20 whose values are NULL — asof_ts
    # must say 20 AND the values must be NULL, not ("old", 1).
    assert got == {"e1": ("old", 1, 5), "e2": (None, None, 20)}


def test_matches_pandas_merge_asof(spark):
    """Differential check against pandas.merge_asof on a generated
    corpus (97 left x 23 right per key, 3 keys, colliding timestamps)."""
    import pandas as pd

    lrows = [
        (f"k{i % 3}", (i * 37) % 211, i) for i in range(97 * 3)
    ]
    rrows = [
        (f"k{i % 3}", (i * 53) % 199, i * 10) for i in range(23 * 3)
    ]
    # merge_asof needs unique right (key, ts); drop collisions the same
    # way the operator's tiebreak would select (max payload per ts)
    rdf = (
        pd.DataFrame(rrows, columns=["key", "ts", "payload"])
        .sort_values(["key", "ts", "payload"])
        .groupby(["key", "ts"], as_index=False)
        .last()
    )
    ldf = pd.DataFrame(lrows, columns=["key", "ts", "eid"]).sort_values(
        ["ts", "key", "eid"]
    )
    expect = pd.merge_asof(
        ldf, rdf.sort_values("ts"), on="ts", by="key",
        direction="backward", allow_exact_matches=True,
    )
    exp = {
        (r.key, r.ts, r.eid): (None if pd.isna(r.payload) else int(r.payload))
        for r in expect.itertuples()
    }

    out = asof_join(
        spark.createDataFrame(
            [(k, int(t), int(e)) for k, t, e in lrows],
            "key string, ts long, eid long",
        ),
        spark.createDataFrame(
            [(r.key, int(r.ts), int(r.payload)) for r in rdf.itertuples()],
            "key string, ts long, payload long",
        ),
        on="key",
    )
    got = {
        (r["key"], r["ts"], r["eid"]): r["payload"] for r in out.collect()
    }
    assert got == exp
