"""URL canonicalization for crawl dedup/partitioning — pure Catalyst
(regexp + array expressions inside whole-stage codegen, no UDF).

Canonical form follows the common crawl-dedup conventions (RFC 3986
normalization plus tracker stripping): lowercase scheme and host, drop
the fragment, drop default ports (http:80 / https:443), drop ``utm_*``
tracking parameters, sort the remaining query parameters, drop an
empty query outright, and normalize an empty path to ``/``. Two URLs that differ only in those aspects
canonicalize identically, which is what makes the canonical string a
valid dedup / partition key at 10^12 pages.

Scale shape: map-only projection over the scan — no shuffle, no state;
the canonical key then feeds the same digest-keyed dedup shuffles as
document text (`dedup.exact_dedup` on ``canonical_url``).
"""

from __future__ import annotations

_URL_RX = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def canonicalize_url(df, url_col: str = "url", out_col: str = "canonical_url"):
    """Add ``out_col`` (the canonical form) plus ``host`` (lowercased,
    port stripped) to ``df``. Rows that do not look like absolute URLs
    canonicalize to NULL (callers route them to a reject sink)."""
    from pyspark.sql import functions as F

    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, _URL_RX, 1))
    authority = F.lower(F.regexp_extract(u, _URL_RX, 2))
    path = F.regexp_extract(u, _URL_RX, 3)
    query = F.regexp_extract(u, _URL_RX, 4)

    host = F.regexp_replace(authority, r":\d+$", "")
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    norm_auth = F.when(keep_port, F.concat(host, F.lit(":"), port)) \
        .otherwise(host)

    # query: split on '&', drop empties and utm_* trackers, sort, rejoin
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (F.length(p) > 0) & ~p.startswith("utm_"),
        )
    )
    norm_query = F.when(
        (query == "") | (F.size(params) == 0), F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(params, "&")))

    canon = F.when(
        (scheme == "") | (host == ""), F.lit(None).cast("string")
    ).otherwise(
        F.concat(
            scheme, F.lit("://"), norm_auth,
            F.when(path == "", F.lit("/")).otherwise(path),
            norm_query,
        )
    )
    return df.withColumn(out_col, canon).withColumn("host", host)
