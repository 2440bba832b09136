"""Property-based pin for the line-dedup tier's core invariant: collapsing
the block-structured extraction's whitespace reproduces the canonical
extraction byte-for-byte, for ARBITRARY html-ish input. Pure pandas — no
SparkSession — so the fuzz runs in milliseconds."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from datasketches_postgresql_spark.dedup.extract import (
    _WS_RE,
    extract_block_series,
    extract_text_series,
)

# fragments that exercise every regex in the pipeline, plus raw noise
_FRAGMENTS = st.one_of(
    st.sampled_from(
        [
            "<div>", "</div>", "<p class='x'>", "</p>", "<br/>", "<li>",
            "<span>", "</span>", "<h2>", "</h2>", "<table><tr><td>", "</td></tr></table>",
            "<script>var x = '<div>';</script>", "<style>.a{}</style>",
            "<!-- <p>gone</p> -->", "&nbsp;", "&amp;", "&lt;", "&gt;", "&quot;", "&#39;",
            " ", " ", "\t", "\n", "  ", "<DIV>", "</LI >",
        ]
    ),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        min_size=0,
        max_size=12,
    ),
)


@given(st.lists(_FRAGMENTS, min_size=0, max_size=30))
@settings(max_examples=300, deadline=None)
def test_block_collapse_equals_canonical(fragments):
    html = pd.Series(["".join(fragments).encode("utf-8")])
    canonical = extract_text_series(html)[0]
    blocks = extract_block_series(html)[0]
    collapsed = _WS_RE.sub(" ", blocks).strip()
    assert collapsed == canonical
