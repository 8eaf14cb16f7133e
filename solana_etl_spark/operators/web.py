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

The "registrable domain" used for grouping follows the public-suffix
list algorithm (publicsuffix.org): the public suffix is the
longest-matching rule (exception rules win outright, the implicit
default rule ``*`` matches one label), and the registrable domain is
the public suffix plus one more label. :data:`PSL_RULES` vendors a
documented SUBSET of the public list in the list's own rule grammar
(exact / ``*.`` wildcard / ``!`` exception), shipped to executors as a
broadcast dimension table — a production deployment swaps in the
complete publicsuffix.org snapshot, same table shape, same plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)(=|$)"
DOMAIN_CAP = 3
DOMAIN_CAP_SHARDS = 16

# Vendored subset of the public suffix list (publicsuffix.org, public
# knowledge), in the list's own grammar: bare rules match exactly,
# "*." rules make every child of the parent a public suffix, "!" rules
# carve exceptions out of a wildcard. The subset covers the gTLDs and
# ccTLD second-level families the synthetic corpus and tests exercise,
# plus the classic *.ck/!www.ck wildcard-exception pair and a few
# private-section entries (blogspot/github) — enough to exercise every
# branch of the algorithm. Production swaps in the full snapshot.
PSL_RULES: tuple[str, ...] = (
    # gTLDs
    "com", "net", "org", "edu", "gov", "mil", "int", "info", "biz",
    "name", "pro", "io", "ai", "app", "dev", "xyz", "online", "site",
    "tech", "store", "blog", "cloud",
    # ccTLDs (first level)
    "uk", "jp", "au", "br", "cn", "in", "nz", "za", "mx", "ar", "tr",
    "kr", "sg", "hk", "tw", "fr", "de", "it", "nl", "es", "se", "ch",
    "at", "be", "dk", "no", "fi", "pl", "ru", "ua", "cz", "pt", "gr",
    "ie", "ca", "us", "co",
    # ccTLD second-level registries
    "co.uk", "org.uk", "me.uk", "net.uk", "ltd.uk", "plc.uk", "ac.uk",
    "gov.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz",
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
    "co.kr", "or.kr", "ne.kr", "go.kr", "ac.kr", "re.kr", "pe.kr",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    # wildcard + exception (the Cook Islands pair from the public list)
    "*.ck", "!www.ck",
    # private section (subset)
    "blogspot.com", "blogspot.co.uk", "github.io", "gitlab.io",
)


def psl_rows(
    rules: tuple[str, ...] | None = None,
) -> list[tuple[str, int, int | None, int | None, int | None]]:
    """``rules`` (default :data:`PSL_RULES`; pass a full publicsuffix.org
    snapshot parsed to its rule lines for production) normalized to
    join-table rows ``(rkey, klab, ps_exact, ps_wild, ps_exc)``: ``rkey``
    is the matchable suffix (wildcard/exception markers stripped),
    ``klab`` its label count, and each ``ps_*`` the public-suffix label
    count a match of that kind implies (exact → klab, wildcard → klab+1
    provided the host HAS a child label, exception → klab−1). One row
    per key; a key carrying several rule kinds folds into one row."""
    rows: dict[str, dict] = {}
    for rule in rules if rules is not None else PSL_RULES:
        if rule.startswith("!"):
            key, kind = rule[1:], "exc"
        elif rule.startswith("*."):
            key, kind = rule[2:], "wild"
        else:
            key, kind = rule, "exact"
        klab = key.count(".") + 1
        r = rows.setdefault(
            key, {"klab": klab, "exact": None, "wild": None, "exc": None}
        )
        r[kind] = {"exact": klab, "wild": klab + 1, "exc": klab - 1}[kind]
    return [
        (k, v["klab"], v["exact"], v["wild"], v["exc"])
        for k, v in sorted(rows.items())
    ]


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


def bare_host(url: Column) -> Column:
    """The canonical host with any surviving port stripped — the domain
    computation's input (the canonical host keeps NON-default ports, but
    ex.com:8443 and ex.com:21 are the same registrable domain and must
    share one cap group)."""
    return F.regexp_replace(_host(url), r":[0-9]+$", "")


def psl_rules_df(
    spark, klab: int | None = None, rules: tuple[str, ...] | None = None
) -> DataFrame:
    """The PSL as a (tiny) dimension table —
    (rkey, klab, ps_exact, ps_wild, ps_exc); optionally just the rules
    with ``klab`` labels. This is what ships to executors via
    ``F.broadcast`` in :func:`with_registrable_domain`. The full ~9k-rule
    publicsuffix.org snapshot is ~300 KB as rows — still far below any
    broadcast threshold."""
    rows = psl_rows(rules)
    if klab is not None:
        rows = [r for r in rows if r[1] == klab]
    return spark.createDataFrame(
        rows,
        schema="rkey string, klab int, ps_exact int, ps_wild int, ps_exc int",
    )


def with_registrable_domain(
    pages: DataFrame,
    url_col: str = "url",
    out_col: str = "domain",
    rules: tuple[str, ...] | None = None,
) -> DataFrame:
    """pages + ``out_col`` = the PSL registrable domain of each row's URL
    (``''`` when the host has no registrable domain — it IS a public
    suffix, or the URL is outside the grammar).

    Algorithm (publicsuffix.org): among rules matching a suffix of the
    host, an exception rule wins outright; otherwise the longest match;
    otherwise the implicit ``*`` default (one label). The public suffix
    has ``ps`` labels per :func:`psl_rows`; the registrable domain is the
    last ``ps + 1`` host labels.

    Spark shape: one LEFT BROADCAST hash join per distinct rule depth
    (3 here — the full public list has 5), each probing the host's
    last-``d``-labels suffix against the depth-``d`` rule slice, then a
    pure projection resolves precedence. Zero shuffles: broadcast
    exchanges ship the (constant-size) rule table, never data — the scan
    side streams through map-side joins, so the stage stays map-only at
    any corpus size."""
    spark = pages.sparkSession
    depths = sorted({r[1] for r in psl_rows(rules)})
    host = bare_host(F.col(url_col))
    out = pages.withColumn("_harr", F.split(host, r"\.")).withColumn(
        "_hn", F.size("_harr")
    )
    n = F.col("_hn")
    for d in depths:
        sfx = F.when(n >= d, F.array_join(F.slice("_harr", -d, d), "."))
        rdf = (
            psl_rules_df(spark, klab=d, rules=rules)
            .select(
                F.col("rkey").alias(f"_k{d}"),
                F.col("ps_exact").alias(f"_pse{d}"),
                F.col("ps_wild").alias(f"_psw{d}"),
                F.col("ps_exc").alias(f"_psx{d}"),
            )
        )
        out = out.withColumn(f"_s{d}", sfx).join(
            F.broadcast(rdf), F.col(f"_s{d}") == F.col(f"_k{d}"), "left"
        )
    exc = F.coalesce(
        *[F.col(f"_psx{d}") for d in reversed(depths)], F.lit(None)
    )
    norm_terms: list[Column] = [F.lit(1)]
    for d in depths:
        norm_terms.append(F.coalesce(F.col(f"_pse{d}"), F.lit(0)))
        # a wildcard's child label must exist for the rule to match
        norm_terms.append(
            F.when(
                F.col(f"_psw{d}").isNotNull() & (n > d), F.col(f"_psw{d}")
            ).otherwise(F.lit(0))
        )
    ps = F.coalesce(exc, F.greatest(*norm_terms))
    k = ps + F.lit(1)
    dom = F.when(
        n > ps, F.array_join(F.slice("_harr", -k, k), ".")
    ).otherwise(F.lit(""))
    scratch = ["_harr", "_hn"] + [
        c
        for d in depths
        for c in (f"_s{d}", f"_k{d}", f"_pse{d}", f"_psw{d}", f"_psx{d}")
    ]
    return out.withColumn(out_col, dom).drop(*scratch)


def canonicalize(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """pages + (url_canonical, domain). The canonical URL is a pure
    projection; the registrable domain adds the PSL broadcast lookups
    (:func:`with_registrable_domain`) — still zero data shuffles."""
    u = F.col(url_col)
    return with_registrable_domain(
        pages.withColumn("url_canonical", canonical_url(u)), url_col
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
    window, no sort). Returns (url_canonical, page_id, n_variants).
    Projects the canonical URL directly (not :func:`canonicalize`) — the
    dedup key doesn't need the domain, so the PSL lookups stay out of
    this plan entirely."""
    return (
        pages.withColumn("url_canonical", canonical_url(F.col(url_col)))
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
    tagged = with_registrable_domain(pages, url_col).select(
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


# --- HTML -> text extraction (the crawl stage upstream of everything) ------

# block-level elements whose open/close tags become line breaks — the
# common-subset list a line-oriented extractor needs (C4's unit is the
# LINE, so block boundaries must survive tag stripping)
HTML_BLOCK_TAGS = (
    "p|div|h[1-6]|li|ul|ol|table|tr|td|th|section|article|header|footer"
    "|nav|blockquote|pre"
)
# (pattern, replacement) chain, applied IN ORDER. Strictly RE2-safe (no
# backreferences — script/style/title are three separate rules for that
# reason) so the DuckDB oracle runs the same patterns verbatim.
HTML_STRIP_RULES: tuple[tuple[str, str], ...] = (
    (r"(?is)<script\b[^>]*>.*?</script>", ""),
    (r"(?is)<style\b[^>]*>.*?</style>", ""),
    (r"(?is)<title\b[^>]*>.*?</title>", ""),
    (r"(?i)<br\s*/?>", "\n"),
    (rf"(?is)</?(?:{HTML_BLOCK_TAGS})\b[^>]*>", "\n"),
    (r"<[^>]+>", ""),
    # minimal entity set; &amp; LAST so "&amp;lt;" decodes to the
    # literal "&lt;" (one pass, never double-decoded)
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", '"'),
    (r"&#39;", "'"),
    (r"&amp;", "&"),
)


def html_to_text(html: Column) -> Column:
    """Extracted text of an HTML payload: drop script/style/title
    subtrees, turn <br> and block-element boundaries into newlines,
    strip remaining tags, decode the minimal entity set, then trim each
    line and drop empties. One regexp_replace chain + one array
    expression — pure per-row projection, fuses into the scan, and every
    pattern is RE2-safe so the oracle runs the identical chain.

    Scale: this is THE first stage of a 100 TB crawl pipeline — raw HTML
    is the bulkiest representation the pipeline ever holds, so the
    extractor being a zero-shuffle scan-fused projection (not a UDF, not
    a parse tree) is what makes the rest affordable; downstream stages
    see only the extracted lines."""
    out = html
    for pat, rep in HTML_STRIP_RULES:
        out = F.regexp_replace(out, pat, rep)
    # explicit one-arg lambda: passing F.trim itself would bind
    # transform's (element, index) form and feed the INDEX to trim's
    # trim-characters parameter
    lines = F.filter(
        F.transform(F.split(out, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    return F.array_join(lines, "\n")


def extract_html_pages(
    pages: DataFrame, html_col: str = "html", id_col: str = "page_id"
) -> DataFrame:
    """(page_id, text): the crawl entry point — raw HTML rows in, the
    line-oriented text the URL/C4/span family consumes out."""
    return pages.select(
        id_col, html_to_text(F.col(html_col)).alias("text")
    )
