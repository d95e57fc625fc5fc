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
    "C": None,  # century: no strptime directive; handled by _CenturyRewrite
    "m": "%m", "d": "%d", "e": "%d", "j": "%j",
    "H": "%H", "k": "%H", "I": "%I", "l": "%I", "p": "%p", "P": "%p",
    "M": "%M", "S": "%S",
    "L": "%f",  # milliseconds — %f tolerates 1-6 digits
    "N": "%f",  # nanoseconds — input pre-trimmed to 6 digits (us truncation)
    "z": "%z", "Z": "%Z",
    "A": "%A", "a": "%a", "B": "%B", "b": "%b", "h": "%b",
    "U": "%U", "W": "%W",  # week-of-year (Sunday-/Monday-based)
    "V": "%V", "G": "%G",  # ISO week / ISO week-based year
    "g": None,  # 2-digit ISO year: no strptime directive; _CenturyRewrite
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


#: value-shape regex per Ruby token, used only to LOCATE the %C/%g digit
#: runs inside an input string so the century rewrite can splice a computed
#: 4-digit year in their place (widths mirror Ruby strptime's greedy
#: up-to-N-digit numeric reads)
_TOKEN_VALUE_RE = {
    "Y": r"\d{1,4}", "y": r"\d{1,2}", "C": r"\d{1,2}", "g": r"\d{1,2}",
    "G": r"\d{1,4}",
    "m": r"\d{1,2}", "d": r"\d{1,2}", "e": r"\s?\d{1,2}", "j": r"\d{1,3}",
    "H": r"\d{1,2}", "k": r"\s?\d{1,2}", "I": r"\d{1,2}", "l": r"\s?\d{1,2}",
    "p": r"[APap]\.?[Mm]\.?", "P": r"[APap]\.?[Mm]\.?",
    "M": r"\d{1,2}", "S": r"\d{1,2}",
    "L": r"\d{1,9}", "N": r"\d{1,9}",
    "z": r"[+-]\d{2}:?\d{2}(?::?\d{2})?", "Z": r"[A-Za-z_+\-/0-9]+",
    "A": r"[A-Za-z]+", "a": r"[A-Za-z]+", "B": r"[A-Za-z]+",
    "b": r"[A-Za-z]+", "h": r"[A-Za-z]+",
    "U": r"\d{1,2}", "W": r"\d{1,2}", "V": r"\d{1,2}",
    "u": r"\d", "w": r"\d",
    "T": r"\d{1,2}:\d{1,2}:\d{1,2}", "F": r"\d{1,4}-\d{1,2}-\d{1,2}",
    "D": r"\d{1,2}/\d{1,2}/\d{1,2}", "R": r"\d{1,2}:\d{1,2}",
    "x": r"\d{1,2}/\d{1,2}/\d{1,2}", "X": r"\d{1,2}:\d{1,2}:\d{1,2}",
    "c": r"[A-Za-z]+\s+[A-Za-z]+\s+[\s\d]?\d\s+"
         r"\d{1,2}:\d{1,2}:\d{1,2}\s+\d{1,4}",
    "n": r"\s", "t": r"\s", "%": r"%", "s": r"\d+",
}


class _CenturyRewrite:
    """Pre-parse rewrite for %C (century) and %g (2-digit ISO week-year),
    which have no strptime directive (reference dialect:
    ExpandJsonFilterPlugin.java:77-79 accepts full Ruby strftime).

    Strategy: build a full-string regex from the format that captures the
    %C/%y/%g digit runs, compute the 4-digit (ISO-)year Ruby-style
    (year = cent*100 + yy; 2-digit years pivot 00-68 -> 2000s, 69-99 ->
    1900s, matching Ruby Date.strptime completion), splice it into the
    value, and hand strptime a %Y/%G format. Non-matching rows pass
    through unchanged and fall out as NaT -> invalid-record channel.
    Supported compositions: %C with %y, %C alone (year = C*100), %g with
    %V + weekday, %C with %g. %C next to %Y/%G is rejected at plan time
    (ambiguous digit boundary; Ruby's year += cent*100 completion on a
    4-digit year is never what a config intends)."""

    def __init__(self, fmt: str):
        pat, out_fmt = [], []
        self.has_cent = self.has_yy = self.has_gg = False
        i = 0
        while i < len(fmt):
            c = fmt[i]
            if c != "%":
                pat.append(re.escape(c))
                out_fmt.append(c)
                i += 1
                continue
            if i + 1 >= len(fmt):
                raise UnsupportedTimestampFormat(f"dangling %% in {fmt!r}")
            j = i + 1
            while j < len(fmt) and (fmt[j].isdigit() or fmt[j] in "-_0^#"):
                j += 1
            tok = fmt[j] if j < len(fmt) else fmt[i + 1]
            vre = _TOKEN_VALUE_RE.get(tok)
            if vre is None:
                raise UnsupportedTimestampFormat(f"%{tok} in {fmt!r}")
            if tok == "C":
                pat.append(r"(?P<cent>\d{1,2})")
                out_fmt.append("\x00C")  # placeholder, resolved below
                self.has_cent = True
            elif tok == "y":
                pat.append(r"(?P<yy>\d{1,2})")
                out_fmt.append("%Y")
                self.has_yy = True
            elif tok == "g":
                pat.append(r"(?P<gg>\d{1,2})")
                out_fmt.append("%G")
                self.has_gg = True
            else:
                pat.append(f"(?:{vre})")
                out_fmt.append(fmt[i:j + 1])
            i = j + 1
        # %C emits the 4-digit year itself only when no %y/%g carries it
        cent_becomes = "" if (self.has_yy or self.has_gg) else "%Y"
        self.new_fmt = "".join(out_fmt).replace("\x00C", cent_becomes)
        self.regex = re.compile("^" + "".join(pat) + "$")

    def splice(self, m: "re.Match") -> str:
        gd = m.groupdict()
        cent = int(gd["cent"]) if gd.get("cent") is not None else None
        edits = []  # (start, end, replacement) spans, applied right-to-left
        if gd.get("yy") is not None or gd.get("gg") is not None:
            grp = "yy" if gd.get("yy") is not None else "gg"
            two = int(gd[grp])
            if cent is not None:
                year = cent * 100 + two
                edits.append((m.start("cent"), m.end("cent"), ""))
            else:
                year = 2000 + two if two <= 68 else 1900 + two
            edits.append((m.start(grp), m.end(grp), f"{year:04d}"))
        elif cent is not None:
            edits.append((m.start("cent"), m.end("cent"), f"{cent * 100:04d}"))
        s = m.group(0)
        for start, end, rep in sorted(edits, reverse=True):
            s = s[:start] + rep + s[end:]
        return s


def _century_rewrite_plan(fmt: str) -> Optional[_CenturyRewrite]:
    """A _CenturyRewrite when the format uses %C/%g, else None."""
    if not re.search(r"%[-_0^#\d]*[Cg]", fmt):
        return None
    return _CenturyRewrite(fmt)


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
    raw = set(re.findall(r"%[-_0^#\d]*(.)", fmt))
    if "C" in raw and raw & set("YG"):
        raise UnsupportedTimestampFormat(
            f"format {fmt!r}: %C (century) next to a 4-digit year (%Y/%G) "
            "is ambiguous — pair %C with %y/%g or use the 4-digit year alone"
        )
    if "g" in raw and raw & set("YyG"):
        raise UnsupportedTimestampFormat(
            f"format {fmt!r}: %g (2-digit ISO year) conflicts with "
            "%Y/%y/%G — use exactly one year token"
        )
    # %C/%g are handled by a pre-parse value rewrite (-> %Y/%G); validate
    # the post-rewrite format so the week/ISO composition rules below see
    # what strptime will actually receive
    plan = _century_rewrite_plan(fmt)
    if plan is not None:
        fmt = plan.new_fmt
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
    work = s.copy()
    century = _century_rewrite_plan(ruby_format)
    if century is not None:
        # splice the Ruby-completed 4-digit (ISO-)year into the value and
        # parse with %Y/%G; rows that don't match the format shape pass
        # through and fall out as NaT below (invalid-record channel)
        work = work.str.replace(century.regex, century.splice, regex=True)
        ruby_format = century.new_fmt
    pyfmt, has_date, has_zone = translate_ruby_to_python(ruby_format)
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
