"""Suffix-array-based exact-substring dedup (SURVEY.md §7.2 S5).

Criterion (the standard one for training-data dedup, cf. "Deduplicating
Training Data Makes Language Models Better": duplicated spans >= L): two
documents are substring-duplicates iff they share a VERBATIM substring of at
least ``min_match_chars`` characters. This catches containment pairs whose
shingle-set Jaccard sits below the LSH threshold (|small|/|big|) and is
robust to boilerplate wrapping (boilerplate stays well under L).

Method (per group, numpy only):
  1. concatenate the group's texts with '\\x00' sentinels;
  2. suffix array via prefix doubling (np.unique ranks + np.lexsort,
     O(N log^2 N), wholly vectorized);
  3. LCP array (Kasai);
  4. adjacent SA entries owned by different docs with
     min(LCP, chars-to-own-doc-end of both suffixes) >= L emit an edge.
     Clamping at doc ends makes sentinel-crossing matches impossible.
     Suffixes sharing a >=L prefix form contiguous SA runs, so adjacent
     pairs connect every doc in the run — transitively completed by the
     connected-components stage downstream (exact, not a heuristic).

Scale scoping (documented, honest): a single global suffix array over 100 TB
is not a Spark-shaped computation; the pipeline applies this operator WITHIN
GROUPS — same-host pages (where near-verbatim republication actually
happens) via ``applyInPandas``, bounding each group to ``max_group_chars``.
Cross-host substring overlap below the LSH threshold is out of scope of this
layer by design.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

DEFAULT_MIN_MATCH_CHARS = 200
DEFAULT_MAX_GROUP_CHARS = 4_000_000


def suffix_array_with_levels(
    codes: np.ndarray, max_level_len: int = 512
) -> tuple[np.ndarray, list[tuple[int, np.ndarray]]]:
    """Prefix-doubling suffix array + rank snapshots for prefix lengths
    1, 2, 4, ... <= max_level_len (the binary-lifting LCP tables)."""
    n = codes.size
    _, rank = np.unique(codes, return_inverse=True)
    rank = rank.astype(np.int32)
    levels = [(1, rank)]
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int32)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        new_rank = np.empty(n, dtype=np.int32)
        changed = (rank[order][1:] != rank[order][:-1]) | (
            key2[order][1:] != key2[order][:-1]
        )
        new_rank[order] = np.concatenate([[0], np.cumsum(changed, dtype=np.int32)])
        rank = new_rank
        if 2 * k <= max_level_len:
            levels.append((2 * k, rank))
        if rank[order[-1]] == n - 1:
            return order, levels
        k *= 2


def suffix_array(codes: np.ndarray) -> np.ndarray:
    return suffix_array_with_levels(codes)[0]


def lcp_adjacent_capped(
    sa: np.ndarray, levels: list[tuple[int, np.ndarray]], n: int
) -> np.ndarray:
    """LCP between SA-adjacent suffixes, exact up to (sum of level lengths)
    ~= 2*max_level_len - 1 and saturating above — all we need is
    min(lcp, min_match_chars), and min_match_chars <= the saturation point.

    Vectorized binary lifting over the doubling rank snapshots: rank equality
    at prefix length p implies the suffixes share p chars (distinct suffixes
    of one text have distinct lengths, so end-padding can never alias). One
    numpy pass per level — replaces the per-character Kasai loop, which was
    the containment stage's bottleneck (O(group chars) Python)."""
    i = sa[:-1].astype(np.int64).copy()
    j = sa[1:].astype(np.int64).copy()
    lcp = np.zeros(i.size, dtype=np.int64)
    for plen, rank in sorted(levels, key=lambda t: -t[0]):
        active = (i < n) & (j < n)
        idx = np.flatnonzero(active)
        eq = idx[rank[i[idx]] == rank[j[idx]]]
        lcp[eq] += plen
        i[eq] += plen
        j[eq] += plen
    return lcp


def lcp_array(codes: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """lcp[i] = LCP(suffix sa[i], suffix sa[i+1]); saturates at ~1023 (ample
    for the >= min_match_chars tests; kept for API compatibility)."""
    _, levels = suffix_array_with_levels(codes)
    out = np.zeros(codes.size, dtype=np.int64)
    out[: codes.size - 1] = lcp_adjacent_capped(sa, levels, codes.size)
    return out


def shared_substring_pairs_pandas(
    doc_ids: np.ndarray, texts: list[str], min_match_chars: int = DEFAULT_MIN_MATCH_CHARS
) -> list[tuple[int, int]]:
    """[(doc_id_lo, doc_id_hi)] pairs sharing a verbatim substring >= L
    within one group. Fully vectorized post-SA."""
    n_docs = len(texts)
    if n_docs < 2:
        return []
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    joined = "\x00".join(texts)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4").astype(np.int64)
    n = codes.size
    starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=starts[1:])
    ends = starts + lens  # exclusive end of each doc's text
    owner = np.searchsorted(starts, np.arange(n), side="right") - 1
    rem = ends[owner] - np.arange(n)  # chars to own doc end (<=0 on sentinels)

    max_level = 512
    while max_level < min_match_chars:
        max_level *= 2
    sa, levels = suffix_array_with_levels(codes, max_level_len=max_level)
    lcp = lcp_adjacent_capped(sa, levels, n)

    left, right = sa[:-1], sa[1:]
    eff = np.minimum(lcp, np.minimum(rem[left], rem[right]))
    mask = (eff >= min_match_chars) & (owner[left] != owner[right])
    if not mask.any():
        return []
    a = doc_ids[owner[left[mask]]]
    b = doc_ids[owner[right[mask]]]
    pairs = np.unique(
        np.stack([np.minimum(a, b), np.maximum(a, b)], axis=1), axis=0
    )
    return [tuple(p) for p in pairs.tolist()]


CONTAIN_SCHEMA = StructType([StructField("a", LongType()), StructField("b", LongType())])


def lgram_hashes(text: str, L: int) -> np.ndarray:
    """Sorted unique content-only polynomial hashes of every L-char window.
    Two docs share a verbatim >= L substring IFF their L-gram hash sets
    intersect (up to the 2^-64 per-pair hash-collision probability) — the
    same criterion the suffix-array layer tests via min(LCP, doc-rem) >= L.
    O(len) vectorized: prefix sums of c_j * B^-j, window hash
    (S[l+L]-S[l]) * B^(l+L) telescopes to content-only."""
    from .chunking import _prefix_powers

    codes = np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype(np.uint64)
    n = codes.size
    if n < L:
        return np.empty(0, dtype=np.uint64)
    pows, ipows = _prefix_powers(n)
    from .shingle import splitmix64

    with np.errstate(over="ignore"):
        weighted = codes * ipows[:n]
        prefix = np.concatenate([[np.uint64(0)], np.cumsum(weighted, dtype=np.uint64)])
        h = (prefix[L:] - prefix[:-L]) * pows[L : n + 1]
    return np.unique(splitmix64(h))


def sa_verify_pairs(
    candidates: DataFrame,
    extracted: DataFrame,
    min_match_chars: int = DEFAULT_MIN_MATCH_CHARS,
    max_group_chars: int = DEFAULT_MAX_GROUP_CHARS,
) -> DataFrame:
    """Verify candidate edges (a, b): keep exactly the pairs sharing a
    verbatim >= min_match_chars substring.

    Implementation: per-pair L-gram rolling-hash set intersection (see
    lgram_hashes) instead of a per-hub suffix array — O(len) per doc vs
    O(len log^2 len) per group, mapInPandas instead of a groupBy shuffle.
    Each doc in a batch is hashed ONCE (dict-memoized) and each pair checks
    overlap with one searchsorted of the smaller sorted set into the larger
    (O(min log max) per pair, touching only the two per-doc sets) — an
    earlier formulation that stacked every pair's copies of both hash sets
    into one array for a global lexsort moved ~50x more bytes and its
    bandwidth-bound sort flatlined multi-core scaling. The suffix-array
    layer remains the engine of the host-grouped containment mode
    (containment_edges below). ``max_group_chars`` is retained for
    signature compatibility; the O(len) path needs no group budget."""
    ta = extracted.select(F.col("doc_id").alias("a"), F.col("text").alias("text_a"))
    tb = extracted.select(F.col("doc_id").alias("b"), F.col("text").alias("text_b"))
    joined = candidates.join(ta, "a").join(tb, "b").select("a", "b", "text_a", "text_b")
    L = int(min_match_chars)

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a_ids = pdf["a"].to_numpy(dtype=np.int64)
            b_ids = pdf["b"].to_numpy(dtype=np.int64)
            hmap: dict[int, np.ndarray] = {}
            for did, txt in zip(
                np.concatenate([a_ids, b_ids]),
                list(pdf["text_a"]) + list(pdf["text_b"]),
            ):
                if int(did) not in hmap:
                    hmap[int(did)] = lgram_hashes(txt, L)
            hits = []
            for i in range(len(pdf)):
                ha, hb = hmap[int(a_ids[i])], hmap[int(b_ids[i])]
                if ha.size == 0 or hb.size == 0:
                    continue
                if ha.size > hb.size:
                    ha, hb = hb, ha
                idx = np.searchsorted(hb, ha)
                idx[idx == hb.size] = hb.size - 1
                if np.any(hb[idx] == ha):
                    hits.append(i)
            if not hits:
                continue
            hit_idx = np.array(hits, dtype=np.int64)
            yield pd.DataFrame({"a": a_ids[hit_idx], "b": b_ids[hit_idx]})

    return joined.mapInPandas(run, schema=CONTAIN_SCHEMA).distinct()


def containment_edges(
    extracted: DataFrame,
    group_col,
    min_match_chars: int = DEFAULT_MIN_MATCH_CHARS,
    max_group_chars: int = DEFAULT_MAX_GROUP_CHARS,
) -> DataFrame:
    """Grouped suffix-array substring dedup: (doc_id, text) grouped by
    ``group_col`` (an expression, e.g. the url host) -> edges (a, b).
    Oversized groups keep their longest docs up to ``max_group_chars``
    (containers are long; the cap is logged via lineage metrics, never
    silently unbounded)."""
    grouped = extracted.select(
        F.col("doc_id"), F.col("text"), group_col.alias("__grp")
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        total = int(pdf["text"].str.len().sum())
        if total > max_group_chars:
            order = pdf["text"].str.len().sort_values(ascending=False).index
            keep, acc = [], 0
            for i in order:
                ln = len(pdf.loc[i, "text"])
                if acc + ln > max_group_chars:
                    continue
                acc += ln
                keep.append(i)
            pdf = pdf.loc[sorted(keep)]
        pairs = shared_substring_pairs_pandas(
            pdf["doc_id"].to_numpy(), pdf["text"].tolist(), min_match_chars
        )
        return pd.DataFrame(pairs, columns=["a", "b"]) if pairs else pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}
        )

    return grouped.groupBy("__grp").applyInPandas(run, schema=CONTAIN_SCHEMA).distinct()
