"""P6 — glob include/exclude path filters (reference parity:
``PathFilter``, /root/reference/src/detector.rs:92-200, applied during
discovery at src/systems/discovery.rs:231-264).

Semantics match the reference's globset behavior:
  - include patterns: if any are given, a path must match AT LEAST ONE
    (empty include list = everything included);
  - exclude patterns: a path must match NONE;
  - exclude is applied after include (detector.rs:155-171).

Glob syntax: ``*`` (any run of chars), ``?`` (one char), ``**`` (any
run, always crossing ``/``), ``[abc]`` / ``[!abc]`` classes, ``{a,b}``
alternation. globset compiles patterns with ``literal_separator=false``
by default — ``*``/``?`` may cross ``/`` — so that is this module's
default too; pass ``literal_separator=True`` for gitignore-style
component-local ``*``.

Spark-first: each pattern compiles to a Java regex, the filter is one
``rlike`` predicate (include alternation OR'd into a single regex), so
Catalyst evaluates it inside the scan stage right after the parquet
row-group read — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPECIAL = ".^$+()|[]{}\\"


class GlobError(ValueError):
    """Invalid glob pattern (reference: DetectorError::InvalidGlobPattern)."""


def glob_to_regex(pattern: str, literal_separator: bool = False) -> str:
    """Translate one glob pattern to an anchored Java-compatible regex."""
    if not pattern:
        raise GlobError("empty glob pattern")
    any_char = "[^/]" if literal_separator else "."
    out: list[str] = []
    i, n = 0, len(pattern)
    depth_braces = 0
    while i < n:
        c = pattern[i]
        if c == "*":
            if i + 1 < n and pattern[i + 1] == "*":
                # ``**`` always crosses separators; collapse ``**/`` so
                # "a/**/b" also matches "a/b" (globset recursive-dir rule)
                i += 2
                if i < n and pattern[i] == "/":
                    out.append("(?:.*/)?")
                    i += 1
                else:
                    out.append(".*")
            else:
                out.append(any_char + "*")
                i += 1
        elif c == "?":
            out.append(any_char)
            i += 1
        elif c == "[":
            j = i + 1
            if j < n and pattern[j] in "!^":
                j += 1
            if j < n and pattern[j] == "]":  # literal ] first in class
                j += 1
            while j < n and pattern[j] != "]":
                j += 1
            if j >= n:
                raise GlobError(f"unterminated character class in {pattern!r}")
            body = pattern[i + 1 : j]
            if body.startswith("!"):
                body = "^" + body[1:]
            out.append("[" + body.replace("\\", "\\\\") + "]")
            i = j + 1
        elif c == "{":
            depth_braces += 1
            out.append("(?:")
            i += 1
        elif c == "}":
            if depth_braces == 0:
                raise GlobError(f"unbalanced '}}' in {pattern!r}")
            depth_braces -= 1
            out.append(")")
            i += 1
        elif c == "," and depth_braces > 0:
            out.append("|")
            i += 1
        elif c == "\\" and i + 1 < n:
            out.append("\\" + pattern[i + 1] if pattern[i + 1] in _SPECIAL
                       else pattern[i + 1])
            i += 2
        else:
            out.append("\\" + c if c in _SPECIAL else c)
            i += 1
    if depth_braces:
        raise GlobError(f"unbalanced '{{' in {pattern!r}")
    return "^" + "".join(out) + "$"


def glob_match(col: Column | str, patterns: list[str],
               literal_separator: bool = False) -> Column:
    """Column: true iff the path matches ANY of the glob patterns."""
    if not patterns:
        raise GlobError("glob_match needs at least one pattern")
    bodies = [glob_to_regex(p, literal_separator)[1:-1] for p in patterns]
    regex = "^(?:" + "|".join(bodies) + ")$"
    return F.col(col).rlike(regex) if isinstance(col, str) else col.rlike(regex)


def path_glob_filter(
    df: DataFrame,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    col: str = "path",
    literal_separator: bool = False,
) -> DataFrame:
    """Apply include/exclude glob filtering to a path column.

    Mirrors ``PathFilter::should_include`` (detector.rs:155-171): with
    include patterns the path must match at least one; with exclude
    patterns it must match none; both empty = identity."""
    out = df
    if include:
        out = out.filter(glob_match(col, include, literal_separator))
    if exclude:
        out = out.filter(~glob_match(col, exclude, literal_separator))
    return out
