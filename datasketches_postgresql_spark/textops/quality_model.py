"""Trainable text-quality classifier — the fastText/CCNet-style learned
tier above the heuristic quality signals (analysis.quality_score,
gopher_filter): a logistic model over bag-of-words features, trained on a
bounded labeled sample and applied corpus-wide with PURE NATIVE
expressions (explode tokens -> broadcast weight join -> exact integer
sum -> sigmoid). CCNet (Wenzek et al. 2020) uses exactly this shape — a
linear classifier over lexical features — to rank crawl text against a
reference corpus; this module is that operator for the engine.

Reference heritage: scoring follows the reference's stored-aggregate
discipline (small mergeable state, one pass over the data —
/root/reference/sql re-aggregation shapes): the model is a tiny
broadcastable table, the corpus is touched once.

Scale shape at 10^12 docs:

- TRAINING is bounded: featurization runs IN Spark (explode + hash), a
  deterministic capped sample of (feature-ids, label) rows collects to
  the driver, and plain numpy full-batch gradient descent fits the
  weights — reproducible bit-for-bit for a given sample and seed.
- SCORING is one explode + one BROADCAST join + one groupBy-sum per doc
  — all JVM-side, no Python in the hot path. Weights are quantized to
  integer MICRO-UNITS so the per-doc accumulation is an exact BIGINT sum
  (order-independent across any partitioning — float summation order
  would make scores layout-dependent); the sigmoid is applied once to
  the settled integer.
- two feature modes: ``vocab`` (explicit word list — small models,
  exactly replayable in ANSI SQL, the correctness-gate path) and
  ``hashed`` (xxhash64 buckets, collision-tolerant fastText-style — the
  unbounded-vocabulary scale path; same scoring plan, the weight table
  is (bucket, w) instead of (word, w)).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass
from pathlib import Path

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one token rule shared by train, score, and the SQL oracle: lowercase
# letter runs (both Java regex and RE2/DuckDB read it identically)
TOKEN_RE = "[a-z]+"
MICRO = 1_000_000  # weight quantization: 1e-6 units


@dataclass(frozen=True)
class QualityModel:
    """mode 'vocab': keys are words; mode 'hashed': keys are bucket ids
    (as strings) over ``n_buckets``. Weights and bias in integer
    micro-units."""

    mode: str
    weights: tuple[tuple[str, int], ...]  # (key, w_micro)
    bias_micro: int
    n_buckets: int = 0

    def save(self, path: str | Path) -> None:
        Path(path).write_text(
            json.dumps(
                {
                    "format": "quality-logistic-v1",
                    "mode": self.mode,
                    "bias_micro": self.bias_micro,
                    "n_buckets": self.n_buckets,
                    "weights": [list(w) for w in self.weights],
                }
            ),
            encoding="utf-8",
        )

    @staticmethod
    def load(path: str | Path) -> "QualityModel":
        d = json.loads(Path(path).read_text(encoding="utf-8"))
        if d.get("format") != "quality-logistic-v1":
            raise ValueError(f"unknown model format in {path}")
        return QualityModel(
            mode=d["mode"],
            weights=tuple((k, int(w)) for k, w in d["weights"]),
            bias_micro=int(d["bias_micro"]),
            n_buckets=int(d["n_buckets"]),
        )

    def score_py(self, text: str) -> float:
        """Driver-side reference scorer, vocab mode only (tests + docs;
        the Spark path is quality_score; hashed mode needs Spark's
        xxhash64). Same tokens, same integer sum."""
        if self.mode != "vocab":
            raise NotImplementedError(
                "score_py replays the vocab mode only — hashed buckets "
                "come from Spark's xxhash64 (use quality_score)"
            )
        import re

        toks = re.findall(TOKEN_RE, (text or "").lower())
        table = dict(self.weights)
        zsum = sum(table.get(t, 0) for t in toks)
        # floor division, exactly like the Spark/SQL path — the logit is
        # an exact integer in micro-units
        z = math.floor(zsum / max(1, len(toks))) + self.bias_micro
        return 1.0 / (1.0 + math.exp(-z / MICRO))

    def z_micro_py(self, text: str) -> int:
        """The exact integer logit (vocab mode) — what quality_z_micro
        emits per row; oracle-comparable."""
        if self.mode != "vocab":
            raise NotImplementedError("vocab mode only")
        import re

        toks = re.findall(TOKEN_RE, (text or "").lower())
        table = dict(self.weights)
        zsum = sum(table.get(t, 0) for t in toks)
        return math.floor(zsum / max(1, len(toks))) + self.bias_micro


def _feature_col(text: Column, mode: str, n_buckets: int) -> Column:
    toks = F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), F.lit(0))
    if mode == "vocab":
        return toks
    return F.transform(
        toks, lambda t: F.pmod(F.xxhash64(t), F.lit(n_buckets)).cast("string")
    )


def train_quality_model(
    df: DataFrame,
    text_col: str,
    label_col: str,
    mode: str = "hashed",
    n_buckets: int = 1 << 18,
    vocab_size: int = 512,
    max_sample: int = 50_000,
    iters: int = 200,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> QualityModel:
    """Fit the logistic model. Featurization and sampling run in Spark;
    the capped (features, label) sample collects to the driver and numpy
    full-batch gradient descent fits deterministically (fixed iteration
    count, no stochastic shuffling; ties in the vocab cut broken by
    word)."""
    if mode not in ("vocab", "hashed"):
        raise ValueError(f"unknown mode {mode!r}")
    feats = df.select(
        F.col(label_col).cast("int").alias("__y"),
        _feature_col(F.col(text_col), mode, n_buckets).alias("__f"),
        F.xxhash64(F.col(text_col)).alias("__ord"),
    )
    # total order: duplicate texts tie on __ord, so the label joins the
    # sort key — any rows still tied are full duplicates (same features,
    # same label), making the selected sample layout-invariant
    sample = feats.orderBy("__ord", "__y").limit(max_sample).collect()
    if mode == "vocab":
        from collections import Counter

        c: Counter[str] = Counter()
        for r in sample:
            c.update(set(r["__f"]))
        # doc-frequency cut, ties by word: layout-invariant vocabulary
        vocab = [w for w, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]]
        index = {w: i for i, w in enumerate(vocab)}
        dim = len(vocab)
    else:
        index = None
        dim = n_buckets

    ys = np.array([r["__y"] for r in sample], dtype=np.float64)
    rows_idx: list[np.ndarray] = []
    for r in sample:
        if index is None:
            ids = np.array([int(b) for b in r["__f"]], dtype=np.int64)
        else:
            ids = np.array(
                [index[t] for t in r["__f"] if t in index], dtype=np.int64
            )
        rows_idx.append(ids)

    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    n = max(1, len(sample))
    # divisor = the FULL token count (matching the scoring formula, which
    # divides the weight sum by size(tokens) — in vocab mode some tokens
    # are out-of-vocabulary but still count toward the mean)
    inv_len = np.array([1.0 / max(1, len(r["__f"])) for r in sample])
    for _ in range(iters):
        # full-batch GD, fastText-style MEAN-of-token-weights features
        # (a count-sum logit scales with document length and swamps the
        # sigmoid; the mean keeps z in a trainable range and matches the
        # scoring formula below)
        zs = np.fromiter(
            (w[ids].sum() for ids in rows_idx), dtype=np.float64, count=len(rows_idx)
        ) * inv_len + b
        ps = 1.0 / (1.0 + np.exp(-zs))
        err = ps - ys
        grad_w = np.zeros_like(w)
        for ids, e, il in zip(rows_idx, err, inv_len):
            np.add.at(grad_w, ids, e * il)
        grad_w = grad_w / n + l2 * w
        b -= lr * float(err.mean())
        w -= lr * grad_w

    wq = np.rint(w * MICRO).astype(np.int64)
    if index is not None:
        weights = tuple(
            (word, int(wq[i])) for word, i in index.items() if wq[i] != 0
        )
    else:
        nz = np.nonzero(wq)[0]
        weights = tuple((str(int(i)), int(wq[i])) for i in nz)
    return QualityModel(
        mode=mode,
        weights=tuple(sorted(weights)),
        bias_micro=int(round(b * MICRO)),
        n_buckets=n_buckets if mode == "hashed" else 0,
    )


def quality_z_micro(
    df: DataFrame,
    text_col: str,
    model: QualityModel,
    id_col: str,
    out_col: str = "z_micro",
) -> DataFrame:
    """df + the EXACT integer logit (micro-units): explode tokens,
    broadcast-join the weight table, one groupBy(id) BIGINT sum —
    order-independent, so scores are identical under any partitioning.
    Token multiplicity counts (bag of words)."""
    spark = df.sparkSession
    wtab = F.broadcast(
        spark.createDataFrame(list(model.weights), "key string, w long")
    )
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(_feature_col(F.col(text_col), model.mode, model.n_buckets)).alias("key"),
    )
    # exact integer accumulation: BIGINT weight sum and BIGINT token
    # count per doc (both order-independent), mean taken as ONE integer
    # division at the end — floor division keeps the logit an exact
    # integer (micro-units are far below any decision resolution), so
    # scores are bit-identical under any partitioning AND replayable in
    # ANSI SQL as an integer expression
    counts = df.select(
        F.col(id_col).alias("__id"),
        F.size(_feature_col(F.col(text_col), model.mode, model.n_buckets)).alias("__nt"),
    )
    sums = (
        toks.join(wtab, "key")
        .groupBy("__id")
        .agg(F.sum("w").alias("__zs"))
    )
    per_doc = counts.join(sums, "__id", "left").select(
        "__id",
        (
            F.floor(
                F.coalesce(F.col("__zs"), F.lit(0))
                / F.greatest(F.col("__nt"), F.lit(1))
            )
            + F.lit(model.bias_micro)
        ).cast("long").alias("__z"),
    )
    return (
        df.join(per_doc, df[id_col] == per_doc["__id"], "left")
        .drop("__id")
        .withColumn(out_col, F.coalesce(F.col("__z"), F.lit(model.bias_micro)).cast("long"))
        .drop("__z")
    )


def quality_score(
    df: DataFrame,
    text_col: str,
    model: QualityModel,
    id_col: str,
    out_col: str = "quality_p",
) -> DataFrame:
    """df + the model probability (sigmoid of the exact integer logit)."""
    z = quality_z_micro(df, text_col, model, id_col, out_col="__zm")
    return z.withColumn(
        out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__zm") / F.lit(float(MICRO))))
    ).drop("__zm")
