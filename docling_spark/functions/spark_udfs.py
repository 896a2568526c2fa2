"""Vectorized pandas UDF wrappers for the scalar C-family functions.

Kept in a module WITHOUT `from __future__ import annotations`: pandas_udf
resolves real type hints, and stringified annotations break its signature
inference.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf

from docling_spark.functions.textnorm import (
    decode_character_codes,
    join_tokens,
    normalize_text_for_matching,
)


@pandas_udf("string")
def decode_character_codes_udf(col: pd.Series) -> pd.Series:
    """C1: /cNNN → chr with the Windows-1250 override map (vectorized)."""
    return col.map(decode_character_codes)


@pandas_udf("string")
def normalize_for_matching_udf(col: pd.Series) -> pd.Series:
    """C2: lower → NFD → strip combining marks → collapse whitespace."""
    return col.map(lambda t: normalize_text_for_matching(t) if t is not None else None)


@pandas_udf("string")
def join_tokens_udf(col: pd.Series) -> pd.Series:
    """A2: fragment joining with the reference's punctuation spacing rules."""
    return col.map(lambda toks: join_tokens(list(toks)) if toks is not None else None)
