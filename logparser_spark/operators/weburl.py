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


def parse_robots(robots, host_col: str = "host", txt_col: str = "robots_txt"):
    """robots.txt text → one rule row per (host, path_prefix, is_allow):
    pure Catalyst (split lines → explode → regexp_extract), the shape a
    crawl pipeline materializes once per host and broadcasts.

    Subset of the Robots Exclusion Protocol that path filtering needs:
    ``Allow:`` / ``Disallow:`` lines (case-insensitive keys, inline
    ``#`` comments stripped, whitespace trimmed). Group attribution
    (User-agent sections) is intentionally out of scope here — the
    caller pre-filters to its agent's section; an empty Disallow value
    (\"allow all\") yields no rule row, matching the spec."""
    from pyspark.sql import functions as F

    line = F.explode(F.split(F.col(txt_col), "\r?\n")).alias("line")
    rx = r"(?i)^\s*(allow|disallow)\s*:\s*([^#]*)"
    kind = F.lower(F.regexp_extract("line", rx, 1))
    path = F.trim(F.regexp_extract("line", rx, 2))
    return (
        robots.select(F.col(host_col), line)
        .select(
            host_col,
            kind.alias("__kind"),
            path.alias("path_prefix"),
        )
        .where((F.col("__kind") != "") & (F.col("path_prefix") != ""))
        .select(
            host_col,
            "path_prefix",
            (F.col("__kind") == "allow").alias("is_allow"),
        )
    )


def robots_filter(pages, rules, host_col: str = "host",
                  path_col: str = "path"):
    """Longest-match robots evaluation (the Google/RFC 9309 rule): for
    each page, among the host's rules whose ``path_prefix`` prefixes
    the page path, the LONGEST wins; on a length tie ``Allow`` wins;
    no matching rule means allowed. Adds ``allowed`` (bool).

    Scale shape: rules tables are per-host and tiny (~10 rules/host,
    ~10^7 hosts) — the join is host-keyed and broadcastable; the
    longest-match argmax is one max(struct(len, is_allow)) aggregate
    with map-side partials, so the page side shuffles once on its own
    id only if the caller didn't already co-partition by host."""
    from pyspark.sql import functions as F

    matched = (
        pages.join(F.broadcast(rules), host_col, "left")
        # non-matching (and no-rule) rows contribute NULL to the max,
        # never a WHERE drop — a host whose rules all miss must still
        # yield its page with allowed = true
        .groupBy(host_col, path_col)
        .agg(
            F.max(
                F.when(
                    F.col("path_prefix").isNotNull()
                    & F.col(path_col).startswith(F.col("path_prefix")),
                    F.struct(
                        F.length("path_prefix").alias("l"),
                        F.col("is_allow").alias("a"),
                    ),
                )
            ).alias("__best")
        )
        .select(
            host_col, path_col,
            (F.col("__best").isNull() | F.col("__best.a"))
            .alias("allowed"),
        )
    )
    return pages.join(matched, [host_col, path_col], "left")
