"""Pure-numpy mergeable sketch kernels (no Spark dependency).

Serialized layouts mirror the reference's cross-worker state convention of
"1-2 parameter header bytes + compact image"
(/root/reference/src/theta_sketch_pg_functions.c:358-359,
 /root/reference/src/hll_sketch_pg_functions.c:307-309): parameters must
survive the shuffle so the combiner can rebuild a correctly-sized union.
"""
