"""URL canonicalization + URL-level dedup for web crawls.

A Common-Crawl-style corpus sees the same page under many spellings —
scheme/host case, default ports, `www.`, trailing slashes, tracking query
params, fragments — and under many fetches (recrawls). Canonicalizing the
URL collapses both BEFORE any text stage runs, which at 10^12 docs is the
cheapest dedup tier of all: a projection plus one hash-keyed groupBy.

Reference analogue: the reference dedups set-valued columns with theta
set algebra (/root/reference/sql/datasketches_theta_sketch.sql:85-93);
URL identity is this pipeline's exact-key counterpart for whole rows.

Canonical form (fixed, documented rules — every one expressible in both
Spark and ANSI-ish SQL so the driver oracle replays them exactly):

1. strip the fragment (``#...``);
2. lowercase scheme and host;
3. drop a leading ``www.`` host label;
4. drop default ports (``:80`` for http, ``:443`` for https);
5. collapse duplicate ``/`` in the path and drop a trailing ``/``
   (so ``/a/`` == ``/a`` and the bare root path == empty);
6. drop tracking query params (``utm_*``, ``gclid``, ``fbclid``,
   ``msclkid``, ``ref``), sort the survivors bytewise, rejoin with ``&``
   (empty query disappears entirely).

Everything is built-in expressions — whole-stage codegen, zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# one regex, shared with the oracle SQL: params whose NAME marks them as
# click-tracking noise
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|ref)(=|$)"


def canonical_url(url: Column) -> Column:
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(
        (scheme == "http"), F.regexp_replace(host, r":80$", "")
    ).otherwise(
        F.when(scheme == "https", F.regexp_replace(host, r":443$", "")).otherwise(host)
    )
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(F.regexp_replace(path, r"/{2,}", "/"), r"/$", "")
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    # a string with no scheme:// is not a URL we can canonicalize — keep it
    # verbatim (identity), else every malformed row would collapse into the
    # single "://" group and dedup_by_url would drop all but one of them
    return F.when(scheme == "", F.trim(url)).otherwise(
        F.concat(scheme, F.lit("://"), host, path, qpart)
    )


def dedup_by_url(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str | None = None,
) -> DataFrame:
    """Keep ONE row per canonical URL: the freshest fetch when ``ts_col``
    is given (recrawl collapse — latest ``warc_ts`` wins, raw url as the
    deterministic tie-break), else the lexicographically-smallest raw url.

    One hash-keyed window; the canonical string itself never shuffles —
    only its fingerprint does, so at crawl scale the exchange carries
    id-width rows. The fingerprint is 128-bit (two independent xxhash64
    lanes): a single 64-bit key would collide ~n²/2^65 times — tens of
    thousands of wrongly-dropped distinct pages at 10^12 docs — while
    the expected 128-bit collision count at that scale is ~10^-15.
    """
    cu = canonical_url(F.col(url_col))
    keyed = df.withColumn("__ckey", F.xxhash64(cu)).withColumn(
        "__ckey2", F.xxhash64(cu, F.lit(0x9E3779B9))
    )
    order = (
        [F.desc(ts_col), F.asc(url_col)] if ts_col is not None else [F.asc(url_col)]
    )
    w = Window.partitionBy("__ckey", "__ckey2").orderBy(*order)
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__ckey", "__ckey2")
    )


# -- per-domain quotas ---------------------------------------------------------

# common multi-label public suffixes for the registrable-domain heuristic
# (a pragmatic subset of the Public Suffix List's two-level entries; the
# full PSL is a data file this sandbox doesn't ship — callers with one can
# pass extra suffixes)
_TWO_LEVEL_SUFFIXES = (
    "co.uk org.uk ac.uk gov.uk com.au net.au org.au com.br com.cn com.mx "
    "co.jp ne.jp or.jp co.kr co.in co.nz co.za com.sg com.tw com.tr com.ar"
).split()


def registrable_domain(url: Column, extra_suffixes: list[str] | None = None) -> Column:
    """The registrable domain ('example.co.uk' from
    'https://a.b.example.co.uk/x') — the key web pipelines cap, rate and
    attribute by. Heuristic: last two host labels, or last three when the
    two-label tail is a known public suffix. Pure native expressions."""
    host = F.lower(
        F.regexp_extract(F.trim(url), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#@]*@)?([^/?#:]*)", 2)
    )
    # schemeless fallback ('example.com/p', '//cdn.x.org/y'): strip any
    # leading '//' and userinfo, and cut at the first path/query/port
    # delimiter — otherwise every distinct path becomes its own "domain"
    # and the cap is silently inert for exactly the spammy rows it exists
    # to bound
    bare = F.regexp_extract(
        F.lower(F.trim(url)), r"^(?://)?(?:[^/?#@]*@)?([^/?#:]*)", 1
    )
    host = F.when(host == "", bare).otherwise(host)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    two = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    three = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1)
    )
    suffixes = list(_TWO_LEVEL_SUFFIXES) + list(extra_suffixes or [])
    is_two_level_suffix = two.isin(suffixes)
    return (
        F.when(n <= 2, host)
        .when(is_two_level_suffix & (n >= 3), three)
        .otherwise(two)
    )


def cap_per_domain(
    df: DataFrame,
    url_col: str = "url",
    max_docs: int = 1000,
    quality_col: str | None = None,
    mode: str = "rank",
    seed: int = 31,
) -> DataFrame:
    """At most ``max_docs`` rows per registrable domain — the standard
    anti-spam / diversity quota (a handful of mirror and SEO domains can
    otherwise dominate a crawl snapshot). Deterministic across layouts.

    mode="rank" (exact): keep the top rows per domain by
    (quality_col desc, url) — one window over the 8-byte domain hash.
    Right when domains are crawl-sized.

    mode="hash" (skew-safe): per-domain counts (one agg), then keep rows
    whose url hash falls in the keep-fraction — NO per-domain sort, so a
    pathological 10^9-page domain costs a scan, not an ordering. Only the
    OVER-CAP domains' counts are broadcast back (under-cap domains keep
    everything, so their rows never need a count): a real crawl has
    10^8-10^9 registrable domains but only the skewed tail exceeds any
    sane cap, so the broadcast side stays small by construction. The cap
    is approximate (binomial around max_docs) and selection ignores
    quality; right for adversarial skew.

    Domain keys are 128-bit (two xxhash64 lanes) in rank mode so two
    distinct domains never silently share one quota; hash mode keys the
    count table the same way."""
    dom = registrable_domain(F.col(url_col))
    keyed = df.withColumn("__dkey", F.xxhash64(dom)).withColumn(
        "__dkey2", F.xxhash64(dom, F.lit(0x9E3779B9))
    )
    if mode == "rank":
        order = (
            [F.desc(quality_col), F.asc(url_col)]
            if quality_col is not None
            else [F.asc(url_col)]
        )
        w = Window.partitionBy("__dkey", "__dkey2").orderBy(*order)
        return (
            keyed.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= max_docs)
            .drop("__rn", "__dkey", "__dkey2")
        )
    if mode != "hash":
        raise ValueError(f"unknown mode {mode!r} (expected 'rank' | 'hash')")
    over_cap = (
        keyed.groupBy("__dkey", "__dkey2")
        .agg(F.count(F.lit(1)).alias("__dn"))
        .where(F.col("__dn") > max_docs)
    )
    u64 = 2**64
    # absent from the (filtered) broadcast = under-cap = keep everything
    keep_frac = F.coalesce(
        F.lit(float(max_docs)) / F.col("__dn"), F.lit(1.0)
    )
    # unsigned view of the signed xxhash64: shift into [0, 1)
    r = (F.xxhash64(F.col(url_col), F.lit(seed)).cast("double") + F.lit(u64 / 2)) / F.lit(
        float(u64)
    )
    return (
        keyed.join(F.broadcast(over_cap), ["__dkey", "__dkey2"], "left")
        .where(r < keep_frac)
        .drop("__dkey", "__dkey2", "__dn")
    )
