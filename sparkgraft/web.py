"""Web-curation URL operators: parse / classify / gate URLs before any
text is fetched or scored — the cheapest and FIRST filter of a web-scale
corpus pipeline (C4 and RefinedWeb both gate on URL before content).

The reference (`/root/reference/event_verify.py`) has no web surface;
these are extension operators per the brief's training-data-pipeline
mandate. Everything is a row-local regexp/HOF expression — pure JVM
codegen, one scan, no shuffle — so the gate costs nothing extra at
100 TB: it rides the same scan that reads the rows.

Regex parsing (not a UDF urllib call): each component is one
``regexp_extract`` with a group, restricted to constructs Java regex
and RE2/DuckDB treat identically, so the DuckDB oracles reproduce the
parse bit-for-bit and the hot path never leaves whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Hosts/path-segments a curation run drops outright. Deliberately tiny
# and embedded (broadcast as literals into the plan); a production run
# swaps in a broadcast-joined blocklist table — the gate's shape is the
# same either way.
DEFAULT_HOST_BLOCKLIST: tuple[str, ...] = ()
DEFAULT_PATH_BLOCKLIST: tuple[str, ...] = ("ads", "tracker")
ALLOWED_SCHEMES: tuple[str, ...] = ("http", "https")


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def parse_url(url: Column | str) -> dict[str, Column]:
    """Split a URL into ``{scheme, host, path, query, domain,
    path_depth, n_params}`` with pure regexp groups. ``domain`` is the
    last-two-labels registrable-domain approximation (a full public-
    suffix list is a broadcast join away; the two-label fallback is
    the standard cheap tier). Missing components are empty strings
    (``regexp_extract`` semantics), never NULL, so rule predicates
    stay two-valued."""
    u = _col(url)
    scheme = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    domain = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    # path depth = number of non-empty segments
    path_depth = F.size(
        F.filter(F.split(path, "/"), lambda s: s != "")
    ).cast("bigint")
    n_params = F.when(query == "", F.lit(0).cast("bigint")).otherwise(
        F.size(F.split(query, "&")).cast("bigint")
    )
    return {
        "scheme": F.lower(scheme),
        "host": host,
        "path": path,
        "query": query,
        "domain": domain,
        "path_depth": path_depth,
        "n_params": n_params,
    }


def url_filter(
    url: Column | str,
    host_blocklist: tuple[str, ...] = DEFAULT_HOST_BLOCKLIST,
    path_blocklist: tuple[str, ...] = DEFAULT_PATH_BLOCKLIST,
    max_depth: int = 6,
    max_params: int = 4,
) -> dict[str, Column]:
    """The URL gate: parse + rule booleans + ``keep`` conjunction.
    Rules: allowed scheme, host not on the blocklist, no blocked path
    segment, bounded path depth, bounded query-parameter count. A URL
    that fails to parse (empty scheme/host) fails the scheme/host
    rules and is dropped — malformed rows dead-letter through the same
    booleans rather than erroring the scan."""
    p = parse_url(url)
    segs = F.filter(F.split(p["path"], "/"), lambda s: s != "")
    seg_blocked = F.lit(False)
    for bad in path_blocklist:
        seg_blocked = seg_blocked | F.array_contains(
            F.transform(segs, F.lower), bad
        )
    host_ok = p["host"] != ""
    for bad in host_blocklist:
        host_ok = host_ok & (p["host"] != bad)
    scheme_ok = F.lit(False)
    for s in ALLOWED_SCHEMES:
        scheme_ok = scheme_ok | (p["scheme"] == s)
    rules = {
        "r_scheme": scheme_ok,
        "r_host": host_ok,
        "r_path": ~seg_blocked,
        "r_depth": p["path_depth"] <= max_depth,
        "r_params": p["n_params"] <= max_params,
    }
    keep = F.lit(True)
    for r in rules.values():
        keep = keep & r
    return {**p, **rules, "keep": keep}


# Query parameters that carry tracking state, not content identity —
# the standard strip set for URL-keyed dedup (utm_* per Google's UTM
# convention, click ids, referrer tags). Prefix-or-exact-name match on
# the "name=" head of each parameter.
TRACKING_PARAM_PATTERN = r"^(utm_|gclid=|fbclid=|ref=)"


def canonical_url(url: Column | str) -> Column:
    """Canonical form of a URL for URL-KEYED DEDUP (r11): the cheapest
    dedup tier of a web-scale corpus — two crawls of the same page
    routinely differ only in case, www, default port, duplicate or
    trailing slashes, tracking parameters, parameter order, or a
    fragment, and every one of those byte-level differences defeats an
    exact-hash key while meaning nothing to content identity.

    Deterministic, documented rules (all row-local codegen regexps —
    rides the scan like the rest of this module; a DuckDB oracle
    reproduces each step):

    - scheme and host lowercased; a leading ``www.`` and a trailing
      dot dropped from the host; the scheme's default port (``:80``
      for http, ``:443`` for https) stripped;
    - path: duplicate slashes collapsed, one trailing slash dropped
      (so ``/a//b/`` and ``/a/b`` collide, and a bare ``/`` collapses
      to the empty path);
    - query: parameters split on ``&``, empties and tracking
      parameters (:data:`TRACKING_PARAM_PATTERN`) dropped, the rest
      SORTED and rejoined — parameter order never distinguishes
      content;
    - the fragment never participates (the component extracts exclude
      it).

    NOT applied (they change content identity or need network truth):
    percent-decoding, IDN/punycode, public-suffix awareness beyond the
    ``domain`` helper, scheme upgrades. Returns one string column."""
    p = parse_url(url)
    scheme = p["scheme"]
    host = F.regexp_replace(p["host"], r"^www\.", "")
    # port strip BEFORE the trailing-dot strip: 'ex.com.:443' must
    # reach the dot rule as 'ex.com.'
    host = (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )
    host = F.regexp_replace(host, r"\.$", "")
    path = F.regexp_replace(p["path"], r"/+", "/")
    path = F.regexp_replace(path, r"/$", "")
    params = F.filter(
        F.split(p["query"], "&"),
        lambda s: (s != "") & (~s.rlike(TRACKING_PARAM_PATTERN)),
    )
    q = F.array_join(F.sort_array(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
