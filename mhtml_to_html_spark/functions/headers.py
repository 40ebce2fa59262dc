"""Vectorized RFC 2047 header decoding (SURVEY §2.3 D12 as a column).

The per-value kernel is :func:`mhtml_to_html_spark.mime.kernels.
decode_mime_header` (reference /root/reference/lib/util.js:227-300:
encoded-word scan with same-charset merge before charset decode);
this wraps it as an Arrow-batched pandas UDF so header projections
stay declarative. Header decode runs once per ARCHIVE row — never per
part and never inside a filter — so the Python transition is paid at
the archive grain, the same amortization contract as the splitter
(input_hint: vectorized pandas/Arrow UDFs, no per-row Python).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def decode_mime_header_col(values: pd.Series) -> pd.Series:
    from ..mime.kernels import decode_mime_header

    # NULL in → NULL out (the oracle mirrors this rule); na_action
    # keeps the kernel from ever seeing a NaN placeholder
    return values.map(decode_mime_header, na_action="ignore").astype("object").where(
        values.notna(), None
    )
