"""URL/domain features for crawl curation — the filter keys of the
C4/RefinedWeb-style pipeline stages (domain blocklists, per-domain
caps, URL dedup) as pure JVM regexp expressions.

No reference analog (meza has no web ops); beyond-reference layer.
Every expression mirrors 1:1 into RE2 for the DuckDB oracle.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["url_features", "registered_domain", "canonical_url"]

# common second-level public suffixes where the registrable domain is
# THREE labels (example.co.uk) — the pragmatic subset; a production
# deployment swaps in the full public-suffix list
_TWO_LEVEL_TLDS = ("co.uk", "ac.uk", "gov.uk", "com.au", "net.au",
                   "co.jp", "com.br", "co.in", "com.cn", "com.mx")


def registered_domain(host: Column) -> Column:
    """Registrable domain from a hostname: last two labels, or last
    three when the suffix is a known two-level TLD; IP literals pass
    through unchanged."""
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    three = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    use3 = two.isin(*_TWO_LEVEL_TLDS) & (three != "")
    return F.when(is_ip, host).otherwise(F.when(use3, three).otherwise(two))


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Decompose a URL column into filter keys — all row-local regexp
    (codegen'd, shuffle-free):

      - ``scheme``, ``host`` (lowercased, port stripped), ``path``
      - ``reg_domain`` — registrable domain (per-domain caps/blocks)
      - ``path_depth`` — number of non-empty path segments
      - ``has_query`` — ``?`` present (session-id spam marker)
      - ``is_ip_host`` — numeric-IP host (crawl-quality signal)
    """
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1))
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    return (df.withColumn("scheme", scheme)
            .withColumn("host", host)
            .withColumn("reg_domain", registered_domain(host))
            .withColumn("path", path)
            .withColumn("path_depth", depth)
            .withColumn("has_query", u.contains("?"))
            .withColumn("is_ip_host",
                        host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")))


# query parameters that never change the resource: analytics/tracking
# identifiers (the FineWeb/C4-style URL-dedup preprocessing list)
_TRACKING_RE = (r"^(utm_[^=]*|gclid|fbclid|msclkid|igshid|mc_cid"
                r"|mc_eid|_ga|ref)(=|$)")


def canonical_url(df: DataFrame, url_col: str = "url",
                  out_col: str = "canonical_url",
                  strip_www: bool = True) -> DataFrame:
    """URL canonicalization — the normalize-before-dedup step of every
    crawl pipeline: two fetches of the same page must map to ONE key
    before exact/near dedup sees them. Adds ``out_col`` with:

      - scheme + host lowercased, leading ``www.`` dropped (opt-out),
      - default ports (http:80 / https:443) dropped, others kept,
      - fragment dropped, trailing slashes dropped,
      - tracking params (utm_*, gclid, fbclid, ref, …) removed,
      - surviving query params SORTED so param order never splits a
        dedup bucket.

    All row-local string/array expressions (split → filter →
    array_sort → array_join), fully codegen'd — no UDF, no shuffle,
    and every step mirrors 1:1 into DuckDB list lambdas for the
    differential oracle.
    """
    u = F.regexp_replace(F.col(url_col), "#.*$", "")   # fragment off
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    host = F.lower(F.regexp_replace(auth, r":\d+$", ""))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    default = ((scheme == "http") & (port == "80")) | \
              ((scheme == "https") & (port == "443"))
    port_part = F.when((port != "") & ~default,
                       F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    path = F.regexp_replace(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)",
                         1),
        "/+$", "")
    qs = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE))
    canon_q = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&"))
    ).otherwise(F.lit(""))
    return df.withColumn(
        out_col, F.concat(scheme, F.lit("://"), host, port_part,
                          path, canon_q))
