"""The reference's SQL function surface as PySpark functions.

Scalar functions -> vectorized pandas (Arrow) UDFs over BinaryType columns;
aggregates -> two-phase DataFrame operators (``..operators.agg``).
Family modules mirror the reference's sql/ DDL files one-to-one:

    theta     <- sql/datasketches_theta_sketch.sql
    hll       <- sql/datasketches_hll_sketch.sql   (bridged to Spark-native
                 hll_sketch_agg/hll_union_agg where possible)
    cpc       <- sql/datasketches_cpc_sketch.sql   (documented alias of theta:
                 same query surface, KMV kernel — SURVEY.md §2.1)
    kll       <- sql/datasketches_kll_{float,double}_sketch.sql
    quantiles <- sql/datasketches_quantiles_double_sketch.sql (legacy alias
                 of kll, k=128 — reference META.json:50-53 marks it legacy)
    req       <- sql/datasketches_req_float_sketch.sql (kll kernel with k=12
                 default + inclusive flag surface)
    fi        <- sql/datasketches_frequent_strings_sketch.sql
    aod       <- sql/datasketches_aod_sketch.sql
"""

from pyspark.sql import Column
from pyspark.sql import functions as _F


def sketch_to_base64(sketch: Column) -> Column:
    """Textual wire format parity: the reference round-trips every sketch
    through base64 text I/O (src/common.c:44-66, src/base64.c). Spark's
    built-in base64/unbase64 fills that role over BinaryType columns."""
    return _F.base64(sketch)


def sketch_from_base64(text: Column) -> Column:
    return _F.unbase64(text)
