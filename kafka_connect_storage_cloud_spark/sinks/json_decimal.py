"""json.decimal.format=BASE64 encoder (Connect JsonConverter default wire
form): a decimal serializes as base64 of BigDecimal.unscaledValue()
.toByteArray() — minimal-length big-endian two's complement.

Kept out of writers.py because pandas_udf resolves real type hints, and
writers.py uses `from __future__ import annotations` (string hints, which
the Arrow UDF inference rejects).
"""

from decimal import Decimal

import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_b64_encoder(scale: int):
    @pandas_udf("string")
    def _b64(s: pd.Series) -> pd.Series:
        import base64

        def enc(d):
            if d is None:
                return None
            unscaled = int(Decimal(d).scaleb(scale))
            # minimal-length signed big-endian == BigInteger.toByteArray()
            length = max(1, (unscaled + (unscaled < 0)).bit_length() // 8 + 1)
            return base64.b64encode(
                unscaled.to_bytes(length, "big", signed=True)
            ).decode("ascii")

        return s.map(enc)

    return _b64
