"""Train the committed quality-classifier fixture model.

Provenance (the artifact is data, like psl_table.npz / cpc_tables.npz):
the training corpus is DERIVED DETERMINISTICALLY from the driver's
sf0.01 documents table by the same rule the `text_quality_model` gate
(and its DuckDB oracle) replays —

    spam docs (label 1): doc_id % 2 = 1, text || one of four spam tails
                         chosen by doc_id % 8 (odd ids hit 1/3/5/7, one
                         per tail — keying on doc_id % 4 would leave two
                         tails unreachable for odd ids)
    clean docs (label 0): doc_id % 2 = 0, text unchanged

so the classifier must LEARN the spam lexicon from data; nothing is
hand-weighted. Vocab mode (exactly replayable in ANSI SQL); weights are
integer micro-units. Rerun after changing the model or the corpus:

    python tools/train_quality_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "datasketches_postgresql_spark",
    "textops",
    "quality_model_fixture.json",
)
# hashed-mode sibling (the unbounded-vocabulary scale path): same corpus
# rule, xxhash64 buckets instead of words. n_buckets is kept small (1024)
# so the committed weight table stays readable; the gate's DuckDB oracle
# replays the bucketing itself via textops/xxh64_sql.py's string chain.
OUT_HASHED = OUT.replace("fixture.json", "fixture_hashed.json")
HASHED_BUCKETS = 1024

SPAM_TAILS = [
    " click here to win a free prize now",
    " subscribe now for exclusive deals and free bonus offers",
    " buy cheap pills online limited offer act now",
    " congratulations you are the lucky winner claim your reward",
]


def spam_text_col():
    from pyspark.sql import functions as F

    did = F.col("doc_id")
    # spam docs are the ODD ids, so the tail key must separate odd ids:
    # doc_id % 8 in {1,3,5,7} maps one-to-one onto the four tails
    tail = (
        F.when(did % 8 == 3, F.lit(SPAM_TAILS[1]))
        .when(did % 8 == 5, F.lit(SPAM_TAILS[2]))
        .when(did % 8 == 7, F.lit(SPAM_TAILS[3]))
        .otherwise(F.lit(SPAM_TAILS[0]))
    )
    return F.when(did % 2 == 1, F.concat(F.col("text"), tail)).otherwise(
        F.col("text")
    )


def main() -> None:
    from pyspark.sql import functions as F

    from datasketches_postgresql_spark.session import get_spark
    from datasketches_postgresql_spark.textops.quality_model import (
        quality_score,
        train_quality_model,
    )

    spark = get_spark("train-quality-fixture", master="local[8]")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id",
        spam_text_col().alias("text"),
        (F.col("doc_id") % 2).cast("int").alias("y"),
    )
    model = train_quality_model(
        docs, "text", "y", mode="vocab", vocab_size=128, max_sample=5000,
        iters=400, lr=2.0,
    )
    scored = quality_score(docs, "text", model, "doc_id")
    acc = scored.select(
        (((F.col("quality_p") > 0.5).cast("int")) == F.col("y")).cast("int").alias("ok")
    ).agg(F.avg("ok")).collect()[0][0]
    model.save(OUT)
    print(
        '{"weights": %d, "bias_micro": %d, "train_accuracy": %.4f, "out": "%s"}'
        % (len(model.weights), model.bias_micro, acc, OUT)
    )

    model_h = train_quality_model(
        docs, "text", "y", mode="hashed", n_buckets=HASHED_BUCKETS,
        max_sample=5000, iters=400, lr=2.0,
    )
    scored_h = quality_score(docs, "text", model_h, "doc_id")
    acc_h = scored_h.select(
        (((F.col("quality_p") > 0.5).cast("int")) == F.col("y")).cast("int").alias("ok")
    ).agg(F.avg("ok")).collect()[0][0]
    model_h.save(OUT_HASHED)
    print(
        '{"weights": %d, "bias_micro": %d, "train_accuracy": %.4f, "out": "%s"}'
        % (len(model_h.weights), model_h.bias_micro, acc_h, OUT_HASHED)
    )


if __name__ == "__main__":
    main()
