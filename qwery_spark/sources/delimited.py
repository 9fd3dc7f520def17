"""Delimited-text helpers: the reference's delimiter auto-detection.

qwery samples 5 lines and picks the separator that splits every sampled
line into the same column count
(app/jvm/core/.../sources/DelimitedInputSource.scala:36-58,64-83).
We reproduce that as a tiny driver-side sniff (O(5 lines), never
distributed) and then hand Spark a FIXED `sep` — the scan itself stays
a normal pushdown-capable CSV scan.
"""

from __future__ import annotations

import gzip
import io

CANDIDATES = ["\t", "|", ",", ";"]


def _open_text(path: str):
    if path.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"), encoding="utf-8", errors="replace")
    return open(path, encoding="utf-8", errors="replace")


def sniff_delimiter(path: str, sample_lines: int = 5) -> str:
    """Pick the candidate delimiter that splits all sampled non-blank
    lines into an equal number (>1) of columns; ties break by candidate
    order (tab, pipe, comma, semicolon — the reference's preference)."""
    lines: list[str] = []
    with _open_text(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line.strip():
                lines.append(line)
            if len(lines) >= sample_lines:
                break
    if not lines:
        return ","
    for cand in CANDIDATES:
        counts = {line.count(cand) for line in lines}
        if len(counts) == 1 and counts.pop() > 0:
            return cand
    return ","


def delimiter_for_extension(path: str) -> str | None:
    p = path[:-3] if path.endswith(".gz") else path
    if p.endswith(".csv"):
        return ","
    if p.endswith(".tsv"):
        return "\t"
    if p.endswith(".psv"):
        return "|"
    return None
