"""Shared array-expression helpers.

One home for the sliding word-n-gram construction used by the shingle,
winnowing, and repetition operators. The pattern carries a perf
invariant worth centralizing: the shifted slices must come from the
ORIGINAL array and be combined via ``zip_with`` — indexing an array
expression inside a per-element lambda (``get(arr, i+j)``) is inlined
by Catalyst and re-evaluated PER ELEMENT, turning O(len) per row into
O(len^2) (the lesson documented in operators/dedup.py since round 1).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

_BIG = 1 << 30  # "to end of array" length for F.slice


def sliding_ngrams(
    arr: Column, n: int, combine: Callable[[Column, Column], Column]
) -> Column:
    """Array whose element i is ``combine``-folded over
    ``arr[i..i+n-1]`` (left fold: ((a_i ∘ a_{i+1}) ∘ ...)), truncated
    to positions holding a FULL n-gram; arrays shorter than ``n`` keep
    one (partial) element so downstream size() arithmetic never sees an
    empty array.

    ``combine`` decides the gram representation: ``concat_ws(" ", a,
    b)`` builds string grams, ``xxhash64(a, b)`` folds hash grams
    without materializing strings.
    """
    combined = arr
    for j in range(1, n):
        shifted = F.slice(arr, j + 1, _BIG)
        combined = F.zip_with(combined, shifted, combine)
    return F.slice(combined, 1, F.greatest(F.size(arr) - (n - 1), F.lit(1)))
