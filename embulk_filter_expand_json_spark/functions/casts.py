"""Vectorized Embulk-type casts over pandas Series (the Arrow batch path).

Each cast replicates the reference's per-row Java semantics
(/root/reference FilteredPageOutput.java:342-396) but runs column-at-a-time
over an Arrow batch: the common case is a single vectorized pandas op, with a
small per-element fallback only on the (rare) rows the fast path rejects.

Every cast returns ``(values, error_mask)`` — the error mask feeds the
invalid-record channel (FilteredPageOutput.java:247-264): rows are dropped
(stop_on_invalid_record=false) or abort the job (true).
"""

from __future__ import annotations

import json
import math
from decimal import Decimal
from typing import Any, Optional, Tuple

import numpy as np
import pandas as pd

from embulk_filter_expand_json_spark.functions.timefmt import parse_timestamp_series

_I64_MAX = (1 << 63) - 1
_I64_MIN = -(1 << 63)


def java_double_to_string(v: float) -> str:
    """Approximate Java ``Double.toString`` (FilteredPageOutput.java:409
    String.valueOf on a Double): decimal notation for 1e-3 <= |v| < 1e7,
    otherwise scientific with a mandatory fractional digit (``1.2345E7``)."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    a = abs(v)
    if v == 0.0 or (1e-3 <= a < 1e7):
        s = repr(v)
        if "e" in s or "E" in s:
            # repr chose sci inside Java's decimal range (e.g. 1e-3) — expand
            d = Decimal(s)
            s = format(d, "f")
        if "." not in s:
            s += ".0"
        return s
    d = Decimal(repr(v)).normalize()
    sign, digits, exp = d.as_tuple()
    mant_digits = "".join(map(str, digits))
    # one digit before the point
    e = exp + len(mant_digits) - 1
    mant = mant_digits[0] + "." + (mant_digits[1:] or "0")
    return f"{'-' if sign else ''}{mant}E{e}"


def _reject_constant(name: str):
    # strict JSON: bare Infinity/NaN/-Infinity are invalid (Python's json
    # accepts them by default; Jackson and the reference do not)
    raise ValueError(f"non-standard JSON constant {name!r}")


def loads_strict(text: str) -> Any:
    return json.loads(text, parse_constant=_reject_constant)


def dumps_java(v: Any) -> str:
    """Compact JSON rendering matching Jackson's (and therefore the
    Catalyst path's get_json_object): floats print like Java
    Double.toString ('3.9285E24', not Python's '3.9285e+24')."""
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, float):
        return java_double_to_string(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, list):
        return "[" + ",".join(dumps_java(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{json.dumps(k, ensure_ascii=False)}:{dumps_java(x)}"
            for k, x in v.items()
        ) + "}"
    raise TypeError(f"unserializable {type(v)}")


def stringify_extracted(v: Any) -> Optional[str]:
    """convertJsonNodeAsString (FilteredPageOutput.java:400-418): None stays
    None; dict/list -> compact JSON (Jackson-style); scalars -> Java
    String.valueOf."""
    if v is None:
        return None
    if isinstance(v, (dict, list)):
        return dumps_java(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return java_double_to_string(v)
    return str(v)


def cast_boolean(s: pd.Series) -> Tuple[pd.Series, pd.Series]:
    """Boolean.parseBoolean: case-insensitive 'true' -> True, anything else
    -> False, never an error (FilteredPageOutput.java:350-352)."""
    notnull = s.notna()
    out = pd.Series(pd.NA, index=s.index, dtype="boolean")
    out[notnull] = s[notnull].str.lower() == "true"
    return out, pd.Series(False, index=s.index)


def _parse_long_slow(x: str) -> Optional[int]:
    """Long.parseLong, then (long) Double.parseDouble fallback
    (FilteredPageOutput.java:361-374): '12345e3' -> 12_345_000 (truncating)."""
    if "_" in x:
        # Python's int()/float() accept '1_0'; Java's parsers do not
        return None
    try:
        v = int(x)
        if _I64_MIN <= v <= _I64_MAX:
            return v
        # Long.parseLong overflows -> Java falls through to the double path
    except ValueError:
        pass
    try:
        d = float(x)
    except ValueError:
        return None
    if math.isnan(d):
        return 0  # Java (long) NaN == 0
    if d >= _I64_MAX:
        return _I64_MAX
    if d <= _I64_MIN:
        return _I64_MIN
    return int(d)  # trunc toward zero, like Java (long) cast


def cast_long(s: pd.Series) -> Tuple[pd.Series, pd.Series]:
    notnull = s.notna()
    out = pd.Series(pd.NA, index=s.index, dtype="Int64")
    err = pd.Series(False, index=s.index)
    if not notnull.any():
        return out, err
    st = s[notnull]
    fast = st.str.fullmatch(r"[+-]?\d{1,18}")
    fast_idx = st.index[fast]
    if len(fast_idx):
        out[fast_idx] = pd.to_numeric(st[fast], errors="raise").astype("int64")
    slow_idx = st.index[~fast]
    for i in slow_idx:
        v = _parse_long_slow(st[i])
        if v is None:
            err[i] = True
        else:
            out[i] = v
    return out, err


def cast_double(s: pd.Series) -> Tuple[pd.Series, pd.Series]:
    """Returns an explicitly-masked Float64 (FloatingArray) so the
    pandas->Arrow boundary in mapInPandas can distinguish a genuine NaN
    value (Double.parseDouble('NaN') is valid in Java) from null — a plain
    float64 NaN would be coerced to null there."""
    n = len(s)
    vals = np.zeros(n, dtype="float64")
    mask = np.ones(n, dtype=bool)  # True = null
    err = np.zeros(n, dtype=bool)
    numeric = pd.to_numeric(s, errors="coerce").to_numpy(dtype="float64")
    notnull = s.notna().to_numpy()
    ok = notnull & ~np.isnan(numeric)
    vals[ok] = numeric[ok]
    mask[ok] = False
    for idx in np.nonzero(notnull & np.isnan(numeric))[0]:
        v = s.iloc[idx]
        # Double.parseDouble also accepts NaN/Infinity spellings (but not
        # Python's '1_0' underscore separators)
        if "_" not in v:
            try:
                vals[idx] = float(v)
                mask[idx] = False
                continue
            except ValueError:
                pass
        err[idx] = True
    return (
        pd.Series(pd.arrays.FloatingArray(vals, mask), index=s.index),
        pd.Series(err, index=s.index),
    )


def cast_string(s: pd.Series) -> Tuple[pd.Series, pd.Series]:
    return s, pd.Series(False, index=s.index)


def cast_json(s: pd.Series) -> Tuple[pd.Series, pd.Series]:
    """JsonParser.parse validation (FilteredPageOutput.java:389-396): the
    stringified value must itself be valid JSON ('abcde' or '' -> invalid
    record, '{}' ok). Output column holds canonical compact JSON text."""
    out = pd.Series(None, index=s.index, dtype="object")
    err = pd.Series(False, index=s.index)
    for i in s.index:
        v = s[i]
        if v is None or v is pd.NA:
            continue
        try:
            parsed = loads_strict(v)
        except (ValueError, TypeError):
            err[i] = True
            continue
        # containers re-serialize canonically (Jackson-compact, matching
        # the Catalyst path); scalars keep their original text — Spark's
        # get_json_object returns raw scalar text ('12345e3' stays
        # '12345e3'), and cross-path agreement is the contract
        out[i] = dumps_java(parsed) if isinstance(parsed, (dict, list)) else v
    return out, err


def cast_timestamp(
    s: pd.Series, ruby_format: str, timezone: str, default_date: str
) -> Tuple[pd.Series, pd.Series]:
    return parse_timestamp_series(s, ruby_format, timezone, default_date)


def apply_cast(
    s: pd.Series,
    embulk_type: str,
    ruby_format: Optional[str] = None,
    timezone: str = "UTC",
    default_date: str = "1970-01-01",
) -> Tuple[pd.Series, pd.Series]:
    if embulk_type == "string":
        return cast_string(s)
    if embulk_type == "boolean":
        return cast_boolean(s)
    if embulk_type == "long":
        return cast_long(s)
    if embulk_type == "double":
        return cast_double(s)
    if embulk_type == "json":
        return cast_json(s)
    if embulk_type == "timestamp":
        assert ruby_format is not None
        return cast_timestamp(s, ruby_format, timezone, default_date)
    raise ValueError(f"unknown embulk type {embulk_type!r}")
