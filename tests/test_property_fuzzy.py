"""Property-based checks (hypothesis) for the from-scratch kernels whose
pruning logic could hide rare-input bugs."""

from hypothesis import given, settings
from hypothesis import strategies as st

from trainable_entity_extractor_spark.functions.fuzzy import indel_ratio, partial_ratio

from tests.test_reference_fixtures import _lcs_dp, oracle_partial_ratio

text_st = st.text(alphabet="abcdef 0123", min_size=0, max_size=40)


@settings(max_examples=300, deadline=None)
@given(text_st, text_st)
def test_partial_ratio_matches_dp_oracle(a, b):
    import math

    assert math.isclose(partial_ratio(a, b), oracle_partial_ratio(a, b), abs_tol=1e-9)


@settings(max_examples=300, deadline=None)
@given(text_st, text_st)
def test_indel_ratio_matches_dp(a, b):
    import math

    total = len(a) + len(b)
    want = 100.0 if total == 0 else 100.0 * 2 * _lcs_dp(a, b) / total
    assert math.isclose(indel_ratio(a, b), want, abs_tol=1e-9)


@settings(max_examples=200, deadline=None)
@given(text_st, text_st, st.floats(min_value=0, max_value=100))
def test_partial_ratio_cutoff_never_changes_accepts(a, b, cutoff):
    """score_cutoff is a pruning hint: any score >= cutoff must equal the
    uncut score (pruning may only affect sub-cutoff values)."""
    full = partial_ratio(a, b)
    cut = partial_ratio(a, b, cutoff)
    if full >= cutoff:
        assert cut == full


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(alphabet="abcd ", min_size=0, max_size=30), min_size=0, max_size=8))
def test_minhash_kernel_matches_per_row_reference(texts):
    """The batch-global vectorized kernel (shared buffer pool, interleaved
    reduceat) must equal computing each row alone — boundary handling
    between rows is exactly where it could silently break."""
    import numpy as np

    from trainable_entity_extractor_spark.kg.linking import _minhash_kernel

    batch = _minhash_kernel(texts, 8, 3, 64)
    for i, t in enumerate(texts):
        single = _minhash_kernel([t], 8, 3, 64)
        assert np.array_equal(batch[i], single[0]), (i, t)
