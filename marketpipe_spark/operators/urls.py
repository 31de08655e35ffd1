"""URL canonicalization and URL-level dedup — the curation stage that runs
BEFORE any text-level dedup in a web-scale pipeline: refetches, mirrors and
tracking-tagged shares of one page collapse by canonical URL, which costs one
map-only pass plus one hash shuffle — orders of magnitude cheaper than
MinHash on the text they carry.

Reference scope: the reference has no web-corpus operators; this extends its
dedup/validation families (SURVEY §2.2 P7, §2.7 — see
/root/reference/src/marketpipe/validation for the rule-report shape) to the
documents domain the same way dedup.py / textclean.py do.

Canonicalization is structural — scheme/host/path/query are parsed with
shared regexes in the Java-regex ∩ RE2 common subset (no backreferences, no
lookaround), so an external SQL engine reproduces every step literally:

- scheme and host lowercased; ``www.`` prefix and default ports (``:80``
  http, ``:443`` https) stripped
- fragment dropped; trailing slashes trimmed from the path (empty → ``/``)
- tracking params (``utm_*``, ``fbclid``, ``gclid``) removed; surviving
  params sorted lexicographically so parameter order never splits a URL

Everything is built-in column expressions: map-only, whole-stage codegen'd,
no UDF. ``url_dedup`` adds the single shuffle on the canonical string (at
corpus scale: a 64-bit hash of it), keyed by a high-cardinality value —
skew-free and linear.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

#: Shared with the SQL oracle (queries_docs.SQL_URL_DEDUP) — keep in the
#: Java-regex ∩ RE2 common subset.
SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
QUERY_RE = r"\?([^#]*)"
TRACKING_PARAM_RE = r"^(utm_|fbclid|gclid)"


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` as a single map-only expression tree."""
    scheme = F.lower(F.regexp_extract(url, SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, HOSTPORT_RE, 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_replace(F.regexp_extract(url, PATH_RE, 1), "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    raw_q = F.regexp_extract(url, QUERY_RE, 1)
    params = F.filter(
        F.split(raw_q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    query = F.concat_ws("&", F.array_sort(params))
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )


def url_host(url: Column) -> Column:
    """Registrable-host column (post-canonicalization host, port stripped) —
    the key for per-domain stats and blocklist joins."""
    hostport = F.lower(F.regexp_extract(url, HOSTPORT_RE, 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    return F.regexp_replace(host, ":[0-9]+$", "")


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Tag every row with its canonical URL, host, and ``keep`` — true iff
    this row has the smallest ``id_col`` for its canonical URL (stable under
    reruns and partitioning). One window shuffle keyed by the canonical
    string; callers at lake scale filter on ``keep`` and drop the tag."""
    tagged = df.withColumn("canonical_url", canonical_url(F.col(url_col))).withColumn(
        "host", url_host(F.col(url_col))
    )
    first = F.min(id_col).over(W.partitionBy("canonical_url"))
    return tagged.withColumn("keep", (F.col(id_col) == first))
