"""URL column functions for web-corpus pipelines — normalization, host and
registered-domain extraction. All native Column expressions (codegen-tier,
no UDFs), with exact DuckDB twins in ``__spark_entry__.oracle_sql``
(``url_normalize`` / ``cap_per_domain``).

Crawl pipelines key almost everything on URLs: exact-duplicate removal
(same page fetched twice), per-domain quotas, domain blocklists. All of
those need one CANONICAL form first — otherwise ``HTTP://WWW.X.COM:80/a?utm_
source=y`` and ``http://x.com/a`` count as different pages and every
downstream key splits.

Normalization contract (frozen; each rule mirrored in the oracle):
- scheme and host lowercase; path/query case preserved
- leading ``www.`` stripped from the host
- default ports dropped (``:80`` http, ``:443`` https), others kept
- fragment dropped
- tracking params dropped (``utm_*``, ``gclid``, ``fbclid``, ``ref``),
  remaining params sorted bytewise for order-independence
- trailing ``/`` stripped from non-root paths; empty path → ``/``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: multi-label public suffixes the naive last-2-labels rule would split
#: wrong (small frozen parity list, not the full PSL — documented contract)
TWO_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "co.in", "co.kr", "co.nz", "co.za",
)

_TRACKING_RE = "^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)="


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(col: Column | str) -> Column:
    return F.lower(F.regexp_extract(_c(col), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def url_host(col: Column | str) -> Column:
    """Lowercased host, credentials and port excluded, ``www.`` stripped."""
    host = F.lower(
        F.regexp_extract(_c(col), r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1)
    )
    return F.regexp_replace(host, r"^www\.", "")


def url_port(col: Column | str) -> Column:
    """Explicit port string, '' if absent."""
    return F.regexp_extract(
        _c(col), r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?[^/:?#]+:([0-9]+)", 1
    )


def url_path(col: Column | str) -> Column:
    """Path with trailing slash stripped; empty → ``/`` (case preserved)."""
    path = F.regexp_extract(_c(col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/$", "")
    return F.when(path == "", F.lit("/")).otherwise(path)


def url_query_canonical(col: Column | str) -> Column:
    """Query string minus tracking params, params sorted; '' if nothing
    survives."""
    q = F.regexp_extract(_c(col), r"\?([^#]*)", 1)
    params = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    return F.array_join(F.array_sort(params), "&")


def normalize_url(col: Column | str) -> Column:
    """The canonical URL (see module contract). Non-URL input (no
    ``scheme://``) normalizes to NULL — filterable, never a bad join key."""
    scheme = url_scheme(col)
    host = url_host(col)
    port = url_port(col)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port != "") & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    q = url_query_canonical(col)
    q_part = F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit(""))
    out = F.concat(scheme, F.lit("://"), host, port_part, url_path(col), q_part)
    return F.when((scheme != "") & (host != ""), out)


def registered_domain(host_col: Column | str) -> Column:
    """eTLD+1 under the frozen :data:`TWO_LABEL_SUFFIXES` list: hosts ending
    in a listed two-label suffix keep three labels, everything else two."""
    host = _c(host_col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    suffixes = F.array(*[F.lit(s) for s in TWO_LABEL_SUFFIXES])
    # NULL host → NULL domain (SQL null propagation): without the guard,
    # concat_ws's null-skipping turns element_at(NULL, ·) parts into ''
    # and a NULL host silently becomes the '' domain (NULL-probe catch)
    return F.when(
        host.isNotNull(),
        F.when(n <= 2, host).otherwise(
            F.when(F.array_contains(suffixes, last2), last3).otherwise(last2)
        ),
    )
