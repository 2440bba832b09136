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

# FALLBACK ONLY: a pragmatic subset of the Public Suffix List's two-level
# entries for environments where the embedded psl_table.npz is absent
# (see registrable_domain(use_psl=False)); the default path uses the full
# embedded PSL.
_TWO_LEVEL_SUFFIXES = (
    "co.uk org.uk ac.uk gov.uk com.au net.au org.au com.br com.cn com.mx "
    "co.jp ne.jp or.jp co.kr co.in co.nz co.za com.sg com.tw com.tr com.ar"
).split()

# full Public Suffix List compiled by tools/gen_psl_table.py from the
# OS-shipped /usr/share/publicsuffix/public_suffix_list.dat (Mozilla PSL,
# public data; ICANN + private sections, unicode + punycode forms).
# Loaded once per driver; the per-depth string sets become Catalyst InSet
# literals, so the lookup stays whole-stage codegen with zero Python.
_PSL_MAX_DEPTH = 5
_psl_cache: dict[str, list[str]] | None = None


def _psl() -> dict[str, list[str]]:
    global _psl_cache
    if _psl_cache is None:
        import io
        from importlib import resources

        import numpy as np

        # importlib.resources (not __file__+open): the package may be
        # imported from the --py-files zip on a cluster
        data = resources.files(__package__).joinpath("psl_table.npz").read_bytes()
        with np.load(io.BytesIO(data)) as z:
            _psl_cache = {
                k: z[k].tolist() for k in z.files if k != "source"
            }
    return _psl_cache


def _host_of(url: Column) -> Column:
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
    # a trailing dot is the DNS root label — not part of the name
    return F.regexp_replace(host, r"\.$", "")


def registrable_domain(
    url: Column,
    extra_suffixes: list[str] | None = None,
    use_psl: bool = True,
) -> Column:
    """The registrable domain ('example.co.uk' from
    'https://a.b.example.co.uk/x') — the key web pipelines cap, rate and
    attribute by.

    Default path: the FULL embedded Public Suffix List (ICANN + private
    sections) with the spec's longest-match / wildcard / exception
    semantics, so platform subdomains stay distinct publishers
    ('alice.github.io' != 'bob.github.io' — under a per-domain cap the
    round-3 heuristic would have collapsed the whole platform to one
    quota). Pure native expressions: per-depth suffix strings tested
    against InSet literal sets, fully inside whole-stage codegen.

    PSL algorithm (publicsuffix.org/list): the prevailing rule is the
    matching exception if any, else the longest matching rule, else '*';
    public suffix = prevailing rule (exception: rule minus its leftmost
    label); registrable domain = public suffix + one more host label.
    Hosts that ARE a public suffix, IP literals, and single-label hosts
    return the host itself (a stable cap key for junk rows).

    ``extra_suffixes``: additional exact rules (any depth).
    ``use_psl=False``: the legacy two-level heuristic — documented
    fallback for environments without the embedded table."""
    host = _host_of(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)

    def suf(d: int) -> Column:
        return F.concat_ws(
            ".", *[F.element_at(labels, -i) for i in range(d, 0, -1)]
        )

    if not use_psl:
        suffixes = list(_TWO_LEVEL_SUFFIXES) + list(extra_suffixes or [])
        is_two_level_suffix = suf(2).isin(suffixes)
        return (
            F.when(n <= 2, host)
            .when(is_two_level_suffix & (n >= 3), suf(3))
            .otherwise(suf(2))
        )

    table = _psl()
    extras: dict[int, list[str]] = {}
    for s in extra_suffixes or []:
        extras.setdefault(s.count(".") + 1, []).append(s.lower())

    # public-suffix depth = max over matching rules (default rule '*' = 1)
    depth_cands = [F.lit(1)]
    for d in range(1, _PSL_MAX_DEPTH + 1):
        exact = table.get(f"exact_{d}", []) + extras.get(d, [])
        if exact:
            depth_cands.append(
                F.when((n >= d) & suf(d).isin(exact), F.lit(d)).otherwise(F.lit(1))
            )
        wild = table.get(f"wild_{d}", [])
        if wild:
            depth_cands.append(
                F.when((n >= d + 1) & suf(d).isin(wild), F.lit(d + 1)).otherwise(
                    F.lit(1)
                )
            )
    ps_depth = F.greatest(*depth_cands)
    # registrable = last (ps_depth + 1) labels; host itself when it IS a
    # public suffix (or shorter)
    reg = F.when(
        n > ps_depth, F.array_join(F.slice(labels, n - ps_depth, ps_depth + 1), ".")
    ).otherwise(host)
    # exception rules beat everything: the rule itself is the registrable
    # domain ('!city.kawasaki.jp' under '*.kawasaki.jp')
    for d in sorted(
        (int(k.split("_")[1]) for k in table if k.startswith("exc_")), reverse=True
    ):
        exc = table[f"exc_{d}"]
        reg = F.when((n >= d) & suf(d).isin(exc), suf(d)).otherwise(reg)
    # IPv4 / bracketed IPv6 literals have no registrable domain: the
    # address itself is the cap key
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$") | host.startswith("[")
    return F.when(is_ip, host).otherwise(reg)


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
