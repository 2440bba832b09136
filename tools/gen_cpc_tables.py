"""Extract the CPC compression spec tables into sketches/cpc_tables.npz.

The canonical CPC wire format (Lang 2017; datasketches.apache.org) defines
its entropy codes by CONSTANT tables — canonical length-limited prefix
codes published identically in datasketches-java (CompressionData.java)
and datasketches-cpp (compression_data.hpp), both Apache-2.0. They are
part of the wire SPEC (like JPEG's default Huffman tables): any reader or
writer of the format embeds exactly these values. This script reads them
out of the datasketches-java jar that ships inside pyspark (reflection
over org.apache.datasketches.cpc.CompressionData) and stores them as an
npz so the engine's numpy codec loads them without a JVM.

Regenerate (requires only pyspark): python tools/gen_cpc_tables.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "datasketches_postgresql_spark", "sketches", "cpc_tables.npz",
)


def main() -> None:
    from datasketches_postgresql_spark.session import get_spark

    spark = get_spark("gen-cpc-tables", master="local[1]", shuffle_partitions=1)
    jvm = spark._jvm
    cls = jvm.java.lang.Class.forName("org.apache.datasketches.cpc.CompressionData")
    fields = {}
    for f in cls.getDeclaredFields():
        f.setAccessible(True)
        fields[f.getName()] = f.get(None)

    def arr2d(java_arr, dtype):
        return np.array([list(row) for row in java_arr], dtype=dtype)

    out = {
        # 22 phase tables x 256 entries: (codeLength << 8 | codeValue)? --
        # stored verbatim as uint16; semantics live in the codec
        "encoding_high": arr2d(fields["encodingTablesForHighEntropyByte"], np.uint16),
        # 22 x 4096 decoding tables (12-bit lookahead -> byte | length<<8)
        "decoding_high": arr2d(fields["decodingTablesForHighEntropyByte"], np.uint16),
        "llu_encoding_65": np.array(list(fields["lengthLimitedUnaryEncodingTable65"]), np.uint16),
        "llu_decoding_65": np.array(list(fields["lengthLimitedUnaryDecodingTable65"]), np.uint16),
        "col_perm_encoding": arr2d(fields["columnPermutationsForEncoding"], np.uint8),
        "col_perm_decoding": arr2d(fields["columnPermutationsForDecoding"], np.uint8),
    }
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}")
    for k, v in out.items():
        print(f"  {k}: shape={v.shape} dtype={v.dtype}")


if __name__ == "__main__":
    main()
