"""Property-based pins for the BPE tokenizer kernel (textops/bpe.py) —
pure Python/numpy, no SparkSession, so the fuzz runs in milliseconds.

Invariants:
- learning then encoding never INCREASES a word's token count vs the
  unmerged (character) encoding, and every count is >= 1;
- the merge table round-trips through the JSON artifact exactly;
- encode is a pure function (same word -> same tokens) and the token
  concatenation reconstructs word + EOW (no characters lost/invented);
- count_text equals the sum of per-word counts over the pre-tokenizer
  split (the cache changes nothing).
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from datasketches_postgresql_spark.textops.bpe import (
    EOW,
    BpeVocab,
    PY_PRETOKEN_RE,
    learn_bpe,
)

_WORD = st.text(
    alphabet=st.characters(whitelist_categories=("Ll",), max_codepoint=0x2FF),
    min_size=1,
    max_size=12,
)
_FREQS = st.dictionaries(_WORD, st.integers(min_value=1, max_value=50),
                         min_size=1, max_size=30)


@settings(max_examples=150, deadline=None)
@given(freqs=_FREQS, n_merges=st.integers(min_value=0, max_value=60))
def test_merges_shrink_and_reconstruct(freqs, n_merges):
    v = learn_bpe(freqs, n_merges)
    v0 = BpeVocab(())
    for w in freqs:
        toks = v.encode_word(w)
        assert 1 <= len(toks) <= len(v0.encode_word(w))
        # lossless: concatenating tokens reproduces the word + sentinel
        assert "".join(toks) == w.replace(EOW, "") + EOW
        assert v.encode_word(w) == toks  # pure function


@settings(max_examples=100, deadline=None)
@given(freqs=_FREQS)
def test_artifact_roundtrip(freqs):
    import tempfile

    v = learn_bpe(freqs, 40)
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
        path = f.name
    v.save(path)
    assert BpeVocab.load(path).merges == v.merges


@settings(max_examples=100, deadline=None)
@given(text=st.text(max_size=200))
def test_count_text_is_sum_of_word_counts(text):
    v = learn_bpe({"the": 9, " the": 9, "and": 5}, 10)
    words = PY_PRETOKEN_RE.findall(text)
    expect = sum(v.count_word(w) for w in words)
    assert v.count_text(text) == expect
    assert v.count_text(text, cache={}) == expect
