"""URL/domain operators for web-scale corpus curation: canonicalization,
canonical-URL dedup (keep-best), registrable-domain extraction and
per-domain caps.

Every transformation here is a pure column expression over one scan —
zero Python, zero UDFs — so canonicalization fuses into whatever plan
consumes it; the dedup/cap operators add exactly one hash-keyed linear
shuffle each. The URL grammar is the plain
``scheme://host[:port]/path[?query][#fragment]`` subset (no userinfo,
no IPv6 literals) and every regex sticks to RE2-safe constructs so the
same patterns run verbatim in the DuckDB oracles.

Canonical form (documented contract, applied in this order):

1. scheme and host lowercased
2. fragment removed
3. default port stripped (``:80`` for http, ``:443`` for https —
   non-default ports are kept)
4. a single leading ``www.`` host label stripped
5. tracking query params dropped: any ``utm_*`` key plus ``fbclid``,
   ``gclid``, ``ref``
6. surviving query params sorted byte-wise; an emptied query string is
   removed entirely
7. trailing ``/`` runs stripped from the path (so ``/a/`` ≡ ``/a`` and
   the bare root ``/`` ≡ no path)

The "registrable domain" used for grouping is the last two dot-labels
of the canonical host — a documented simplification standing in for the
public-suffix list (which is itself just a broadcast dimension table in
a production deployment).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)(=|$)"
DOMAIN_RE = r"([^.]+\.[^.]+)$"
DOMAIN_CAP = 3
DOMAIN_CAP_SHARDS = 16


def _scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, URL_RE, 1))


def _host(url: Column) -> Column:
    hp = F.lower(F.regexp_extract(url, URL_RE, 2))
    scheme = _scheme(url)
    host = (
        F.when(scheme == "http", F.regexp_replace(hp, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hp, r":443$", ""))
        .otherwise(hp)
    )
    return F.regexp_replace(host, r"^www\.", "")


def _path(url: Column) -> Column:
    return F.regexp_replace(F.regexp_extract(url, URL_RE, 3), r"/+$", "")


def _query(url: Column) -> Column:
    raw = F.regexp_extract(url, URL_RE, 4)  # '?a=1&b=2' or ''
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_replace(raw, r"^\?", ""), "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    return F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))


def canonical_url(url: Column) -> Column:
    """The canonical form of ``url`` per the module contract — one
    codegen projection. URLs outside the grammar canonicalize to
    ``://`` + empties; callers that must reject them can filter on
    ``canonical_url(c) != '://'``."""
    return F.concat(
        _scheme(url), F.lit("://"), _host(url), _path(url), _query(url)
    )


def domain_of(url: Column) -> Column:
    """Registrable domain (last two labels of the canonical host). Any
    surviving port is stripped first — the canonical host keeps
    NON-default ports, but ex.com:8443 and ex.com:21 are the same
    registrable domain and must share one cap group."""
    host = F.regexp_replace(_host(url), r":[0-9]+$", "")
    return F.regexp_extract(host, DOMAIN_RE, 1)


def canonicalize(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """pages + (url_canonical, domain) — pure projection, zero shuffle."""
    u = F.col(url_col)
    return pages.withColumn("url_canonical", canonical_url(u)).withColumn(
        "domain", domain_of(u)
    )


def url_dedup_keep_best(
    pages: DataFrame,
    url_col: str = "url",
    id_col: str = "page_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per canonical URL: the same resource served with tracking
    noise / host case / default ports / fragments collapses to its best
    copy — longest text wins, ties to the smallest id (the deterministic
    struct-argmax, one hash aggregate on the canonical-url key; no
    window, no sort). Returns (url_canonical, page_id, n_variants)."""
    return (
        canonicalize(pages, url_col)
        .select(
            "url_canonical",
            F.struct(
                F.length(text_col).alias("len"),
                (-F.col(id_col)).alias("neg_id"),
            ).alias("_k"),
        )
        .groupBy("url_canonical")
        .agg(
            F.max("_k").alias("_best"),
            F.count(F.lit(1)).alias("n_variants"),
        )
        .select(
            "url_canonical",
            (-F.col("_best.neg_id")).cast("long").alias(id_col),
            "n_variants",
        )
    )


def per_domain_cap(
    pages: DataFrame,
    cap: int = DOMAIN_CAP,
    url_col: str = "url",
    id_col: str = "page_id",
    n_shards: int = DOMAIN_CAP_SHARDS,
) -> DataFrame:
    """Keep at most ``cap`` pages per registrable domain, chosen by a
    deterministic content-free order (md5 of ``domain:id``) so the cap
    is an unbiased sample, reproducible across engines and retries.

    Scale shape: a mega-domain (half the crawl is one host) would make a
    single ``row_number`` partition one hot reducer, so the rank runs in
    two levels — first within ``(domain, shard)`` where shard is a hash
    of the id (bounding any partition to ~domain/n_shards rows), then a
    final rank over the ≤ ``cap * n_shards`` per-domain survivors. Both
    levels keep exactly the global top-``cap`` rows by the md5 order:
    each global winner ranks ≤ cap inside its own shard, so level 1
    never evicts one."""
    from pyspark.sql import Window

    order = F.md5(
        F.concat(F.col("domain"), F.lit(":"), F.col(id_col).cast("string"))
    )
    tagged = canonicalize(pages, url_col).select(
        id_col, "domain", order.alias("_ord")
    )
    shard = F.pmod(F.crc32(F.col(id_col).cast("string")), F.lit(n_shards))
    lvl1 = Window.partitionBy("domain", shard.alias("_shard")).orderBy("_ord")
    pruned = (
        tagged.withColumn("_r1", F.row_number().over(lvl1))
        .filter(F.col("_r1") <= cap)
        .drop("_r1")
    )
    lvl2 = Window.partitionBy("domain").orderBy("_ord")
    return (
        pruned.withColumn("_r2", F.row_number().over(lvl2))
        .filter(F.col("_r2") <= cap)
        .select(id_col, "domain")
    )
