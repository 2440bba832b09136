"""Train a BPE merge table (textops/bpe.py) from a parquet corpus and save
it as the JSON artifact jobs/prepare_training_data.py --bpe-vocab loads.

    python tools/train_bpe_vocab.py --input /path/docs.parquet \
        --text-col text --merges 4000 --max-words 50000 \
        --output vocab.json [--master local[32]]

Training is bounded (one distributed word count, top max-words collected)
and layout-invariant, so the artifact is reproducible for a given corpus
and parameters.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="parquet with a text column")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--merges", type=int, default=4000)
    ap.add_argument("--max-words", type=int, default=50_000)
    ap.add_argument("--output", required=True, help="vocab json path")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from datasketches_postgresql_spark.session import get_spark
    from datasketches_postgresql_spark.textops.bpe import train_bpe

    spark = get_spark("train-bpe-vocab", master=args.master)
    df = spark.read.parquet(args.input)
    vocab = train_bpe(
        df, args.text_col, n_merges=args.merges, max_words=args.max_words
    )
    vocab.save(args.output)
    print(
        '{"merges": %d, "output": "%s"}' % (len(vocab.merges), args.output)
    )


if __name__ == "__main__":
    main()
