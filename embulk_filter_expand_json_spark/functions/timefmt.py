"""Ruby-strftime (Embulk TimestampFormatter dialect) -> Python/Java translation.

The reference parses timestamps with Ruby-strftime formats, per-column
timezone and a default date for time-only formats
(/root/reference FilteredPageOutput.java:130-154, 375-388;
ExpandJsonFilterPlugin.java:77-83). Embulk is nanosecond-precision; Spark
TimestampType is microseconds — fractional digits beyond 6 are truncated
(documented deviation; see SURVEY.md §1.2).
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import pandas as pd

# Ruby strftime token -> Python strptime token (None = unsupported).
# Week/weekday/ISO tokens follow strptime composition rules: %U/%W form a
# date only together with a year + weekday, %V only with %G + weekday.
# INCOMPLETE combinations raise ValueError at strptime time, so
# validate_ruby_format rejects them at plan time (clean ConfigException
# instead of an executor-side crash mid-job).
_RUBY_TO_PY = {
    "Y": "%Y", "y": "%y",
    "C": None,  # century alone is ambiguous in strptime; rejected at plan time
    "m": "%m", "d": "%d", "e": "%d", "j": "%j",
    "H": "%H", "k": "%H", "I": "%I", "l": "%I", "p": "%p", "P": "%p",
    "M": "%M", "S": "%S",
    "L": "%f",  # milliseconds — %f tolerates 1-6 digits
    "N": "%f",  # nanoseconds — input pre-trimmed to 6 digits (us truncation)
    "z": "%z", "Z": "%Z",
    "A": "%A", "a": "%a", "B": "%B", "b": "%b", "h": "%b",
    "U": "%U", "W": "%W",  # week-of-year (Sunday-/Monday-based)
    "V": "%V", "G": "%G",  # ISO week / ISO week-based year
    "g": None,  # 2-digit ISO year: no strptime directive; rejected at plan time
    "u": "%u", "w": "%w",  # weekday ISO 1-7 / Sunday-0
    "x": "%x", "X": "%X", "c": "%c",  # locale date/time/datetime (C locale)
    "T": "%H:%M:%S", "F": "%Y-%m-%d", "D": "%m/%d/%y", "R": "%H:%M",
    "n": "\n", "t": "\t", "%": "%%",
    "s": None,  # epoch seconds — handled separately if ever needed
}

_DATE_TOKENS = set("YyCmdejFDxcGgUVWuwAaBbh")
_ZONE_TOKENS = set("zZ")

# Ruby strftime token -> Java DateTimeFormatter pattern (for the Catalyst
# fast path via try_to_timestamp); None = not expressible -> Arrow path.
_RUBY_TO_JAVA = {
    "Y": "yyyy", "y": "yy",
    "m": "MM", "d": "dd",
    "H": "HH", "I": "hh", "p": "a",
    "M": "mm", "S": "ss",
    "z": "xx",  # +0900 style offset
    "T": "HH:mm:ss", "F": "yyyy-MM-dd",
    "%": "%",
}


class UnsupportedTimestampFormat(ValueError):
    pass


def translate_ruby_to_python(fmt: str) -> Tuple[str, bool, bool]:
    """-> (python_format, has_date, has_zone)."""
    out = []
    has_date = False
    has_zone = False
    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c != "%":
            out.append(c)
            i += 1
            continue
        if i + 1 >= len(fmt):
            raise UnsupportedTimestampFormat(f"dangling %% in {fmt!r}")
        tok = fmt[i + 1]
        # skip Ruby width/flag modifiers like %6N, %-d, %_H, %03N
        j = i + 1
        while j < len(fmt) and (fmt[j].isdigit() or fmt[j] in "-_0^#"):
            j += 1
        if j < len(fmt):
            tok = fmt[j]
        py = _RUBY_TO_PY.get(tok)
        if py is None:
            raise UnsupportedTimestampFormat(f"%{tok} in {fmt!r}")
        out.append(py)
        if tok in _DATE_TOKENS:
            has_date = True
        if tok in _ZONE_TOKENS:
            has_zone = True
        i = j + 1
    return "".join(out), has_date, has_zone


def translate_ruby_to_java(fmt: str) -> Optional[str]:
    """Java DateTimeFormatter pattern for the Catalyst fast path, or None
    when the format needs the Arrow path (e.g. %N fractional seconds)."""
    out = []
    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c != "%":
            if c.isalpha():
                out.append(f"'{c}'")
            else:
                out.append(c)
            i += 1
            continue
        if i + 1 >= len(fmt):
            return None
        tok = fmt[i + 1]
        java = _RUBY_TO_JAVA.get(tok)
        if java is None:
            return None
        out.append(java)
        i += 2
    return "".join(out)


_FRAC_TRIM_RE = re.compile(r"(\.\d{6})\d+")
#: any fractional-seconds token incl. Ruby width/flag modifiers: %N, %3N,
#: %9N, %03L, %-N ... (modifiers are legal Ruby strftime and accepted by
#: translate_ruby_to_python, so the trim guard must accept them too)
_FRAC_TOKEN_RE = re.compile(r"%[-_0^#\d]*[NL]")
#: pure epoch-seconds format (Ruby %s) — not expressible in strptime,
#: handled as a numeric parse
_EPOCH_SECONDS_RE = re.compile(r"\s*%s\s*$")


def validate_ruby_format(fmt: str) -> None:
    """Plan-time validation: raise UnsupportedTimestampFormat for formats the
    engine cannot parse, so misconfiguration surfaces as a ConfigException at
    plan_expansion time rather than an executor-side error mid-job
    (reference: format problems surface in Embulk's transaction(),
    ExpandJsonFilterPlugin.java:122-129)."""
    if _EPOCH_SECONDS_RE.fullmatch(fmt):
        return
    pyfmt, _has_date, _has_zone = translate_ruby_to_python(fmt)
    # strptime composition rules for week/ISO tokens: an incomplete
    # combination raises ValueError at PARSE time (errors='coerce' does not
    # swallow format-level errors), which would abort the job executor-side
    # mid-run — reject it here instead, like %C/%g (rules verified against
    # pandas/CPython strptime behavior)
    d = set(re.findall(r"%(.)", pyfmt))
    # CPython strptime accepts only %a/%A/%w as the weekday for %U/%W
    # ('%Y %U %u' raises ValueError even under errors='coerce'); %u is the
    # ISO weekday and pairs only with %G/%V
    weekday_uw = d & set("aAw")
    weekday_iso = d & set("aAwu")
    if (d & set("UW")) and not ((d & set("Yy")) and weekday_uw):
        raise UnsupportedTimestampFormat(
            f"format {fmt!r}: %U/%W require a year (%Y/%y) and a weekday "
            "(%a/%A/%w — %u is ISO-only) to form a date"
        )
    if "V" in d:
        if d & set("Yy"):
            raise UnsupportedTimestampFormat(
                f"format {fmt!r}: ISO week %V is incompatible with %Y/%y — "
                "use the ISO year %G"
            )
        if not ("G" in d and weekday_iso):
            raise UnsupportedTimestampFormat(
                f"format {fmt!r}: ISO week %V requires the ISO year %G and "
                "a weekday (%a/%A/%w/%u)"
            )
    elif "G" in d:
        raise UnsupportedTimestampFormat(
            f"format {fmt!r}: ISO year %G requires the ISO week %V and a "
            "weekday (%a/%A/%w/%u)"
        )


def parse_timestamp_series(
    values: pd.Series,
    ruby_format: str,
    timezone: str,
    default_date: str,
) -> Tuple[pd.Series, pd.Series]:
    """Parse a string Series with reference semantics.

    Returns (utc_timestamps: datetime64[us, UTC], error_mask: bool).
    Nulls pass through as NaT with error_mask False; unparseable non-null
    values get error_mask True (-> invalid-record channel).
    """
    s = values.astype("string")
    notnull = s.notna()
    if _EPOCH_SECONDS_RE.fullmatch(ruby_format):
        # Ruby %s: integer seconds since the UNIX epoch (always UTC;
        # timezone/default_date do not apply)
        nums = pd.to_numeric(s.str.strip(), errors="coerce")
        parsed = pd.to_datetime(nums, unit="s", errors="coerce", utc=True)
        return parsed, notnull & parsed.isna()
    pyfmt, has_date, has_zone = translate_ruby_to_python(ruby_format)
    work = s.copy()
    if _FRAC_TOKEN_RE.search(ruby_format):
        # ns -> us truncation (Embulk is ns-precision, Spark is us); the
        # regex accepts width-modified tokens (%3N, %9N, %03L) too
        work = work.str.replace(_FRAC_TRIM_RE, lambda m: m.group(1), regex=True)
    if not has_date:
        # Embulk default_date fills the date for time-only formats
        # (ExpandJsonFilterPlugin.java:81-83)
        work = default_date + " " + work
        pyfmt = "%Y-%m-%d " + pyfmt
    parsed = pd.to_datetime(work, format=pyfmt, errors="coerce", utc=has_zone)
    if not has_zone:
        parsed = parsed.dt.tz_localize(
            timezone, ambiguous=True, nonexistent="shift_forward"
        ).dt.tz_convert("UTC")
    else:
        parsed = parsed.dt.tz_convert("UTC")
    # defense in depth at the pandas->Arrow boundary: Spark TimestampType is
    # microseconds; any residual sub-us precision would make PyArrow refuse
    # the ns->us conversion and crash the job
    parsed = parsed.dt.floor("us")
    err = notnull & parsed.isna()
    return parsed, err
