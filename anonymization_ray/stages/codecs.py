"""Value codecs: map typed attribute columns to a canonical numeric dtype.

The reference dispatches per ``rdfs:range`` datatype
(``entities/Configuration.java:29-65``): numerics as double
(``GeneralizationNumeric.java:28``), dates as ISO LocalDate -> epoch days
(``GeneralizationDate.java:47,52``), dateTimes as Calendar millis
(``GeneralizationDateTime.java:40-44``) with distances in seconds
(``RandomizationDateTime.java:32``). We mirror those units exactly so bucket
midpoints and noise scales match.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import java_half

NUMERIC = "numeric"
DATE = "date"
DATETIME = "dateTime"


def kind_for_datatype(datatype: str) -> str:
    if datatype in ("integer", "double", "float", "decimal"):
        return NUMERIC
    if datatype == "date":
        return DATE
    if datatype == "dateTime":
        return DATETIME
    raise ValueError(f"no numeric codec for datatype {datatype!r}")


@dataclass(frozen=True)
class Codec:
    kind: str

    def to_numeric(self, arr: pa.ChunkedArray | pa.Array) -> pa.Array:
        """Column -> canonical numeric array (float64 / int64 days / int64 ms)."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        t = arr.type
        if self.kind == NUMERIC:
            return pc.cast(arr, pa.float64())
        if self.kind == DATE:
            if pa.types.is_string(t) or pa.types.is_large_string(t):
                arr = pc.cast(arr, pa.date32())
            elif pa.types.is_timestamp(t):
                arr = pc.cast(arr, pa.date32())
            return pc.cast(arr, pa.int32()).cast(pa.int64())  # epoch days
        if self.kind == DATETIME:
            if pa.types.is_string(t) or pa.types.is_large_string(t):
                arr = pc.cast(arr, pa.timestamp("ms"))
            elif not pa.types.is_timestamp(t):
                raise ValueError(f"cannot read dateTime from {t}")
            # sub-millisecond input truncates (xsd:dateTime carries seconds)
            arr = arr.cast(pa.timestamp("ms"), safe=False)
            return pc.cast(arr, pa.int64())  # epoch millis
        raise AssertionError(self.kind)

    def midpoint(self, a: float | int | None, b: float | int | None):
        """Bucket-boundary median of two adjacent sorted values.

        numeric: (a+b)/2.0 (``GeneralizationNumeric.java:37-45``);
        date: epoch-day integer half (``GeneralizationDate.java:40-48``);
        dateTime: millis integer half (``GeneralizationDateTime.java:33-46``).
        One-sided (None) -> the other value.
        """
        if a is None:
            return b
        if b is None:
            return a
        if self.kind == NUMERIC:
            return (a + b) / 2.0
        return java_half(int(a) + int(b))

    def midpoint_array(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Vectorized ``midpoint`` over aligned non-null pairs."""
        if self.kind == NUMERIC:
            return (a.astype(np.float64) + b.astype(np.float64)) / 2.0
        s = a.astype(np.int64) + b.astype(np.int64)
        # java long /2: truncation toward zero
        return np.where(s >= 0, s // 2, -((-s) // 2))

    def format_array(self, arr: pa.Array | pa.ChunkedArray) -> pa.Array:
        """Vectorized ``format_value`` (parity unit-tested)."""
        from ..util import format_double

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if self.kind == NUMERIC:
            return format_double(pc.cast(arr, pa.float64()))
        if self.kind == DATE:
            if not pa.types.is_date32(arr.type):
                arr = pc.cast(pc.cast(arr, pa.int64()), pa.int32()).cast(pa.date32())
            out = pc.cast(arr, pa.string())
            return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out
        if not pa.types.is_timestamp(arr.type):
            arr = pc.cast(arr, pa.int64()).cast(pa.timestamp("ms"))
        # whole seconds: Arrow's %S would print the fraction; the reference's
        # lexical form (and format_value) truncates to seconds
        arr = arr.cast(pa.timestamp("s"), safe=False)
        out = pc.strftime(arr, format="%Y-%m-%dT%H:%M:%S")
        return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out

    def distance_scale(self) -> float:
        """Noise-space units per canonical-numeric unit: dateTime noise is in
        seconds while values are millis (``RandomizationDateTime.java:32,38``)."""
        return 1000.0 if self.kind == DATETIME else 1.0

    def numeric_dtype(self) -> pa.DataType:
        return pa.float64() if self.kind == NUMERIC else pa.int64()

    def from_numeric(self, vals: np.ndarray, mask: np.ndarray | None = None) -> pa.Array:
        """Canonical numeric array -> output Arrow array in the natural type."""
        if self.kind == NUMERIC:
            return pa.array(vals, type=pa.float64(), mask=mask)
        if self.kind == DATE:
            return pa.array(vals.astype(np.int32), type=pa.date32(), mask=mask)
        return pa.array(vals.astype(np.int64), type=pa.timestamp("ms"), mask=mask)

    def format_value(self, v) -> str:
        """Lexical form used in flat-JSON outputs (reference stringifies all
        values, ``FaltJsonService.java:185,204-215``)."""
        if v is None:
            return ""
        if self.kind == NUMERIC:
            return repr(float(v))
        if self.kind == DATE:
            import datetime

            return (datetime.date(1970, 1, 1) + datetime.timedelta(days=int(v))).isoformat()
        import datetime

        return datetime.datetime.fromtimestamp(int(v) / 1000.0, datetime.timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%S"
        )


CODECS = {k: Codec(k) for k in (NUMERIC, DATE, DATETIME)}
