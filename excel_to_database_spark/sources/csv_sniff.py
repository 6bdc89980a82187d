"""Delimiter sniffing.

Same decision procedure as the reference (app/csv_sniff.py:5-22,
app/data.py:36-40), re-implemented:

  * candidates tried in order (default ``, ; | \\t``);
  * a candidate is *valid* only if every sampled row parses to the same
    number of fields (csv_sniff.py:13-16);
  * among valid candidates, highest column count wins; ties keep the
    earlier candidate (strict ``>`` comparison, csv_sniff.py:19-21);
  * no valid candidate → the default delimiter (``,``);
  * the sample is bounded (10 lines, data.py:36) so sniffing cost is
    O(1) regardless of file size — at cluster scale the sniff runs on a
    ``spark.read.text(path).limit(10)`` sample, never the full file.

A single-column file (no delimiter present at all) yields one field per
row for every candidate — all tie at 1 column and the default wins,
matching the reference's fallback assert (csv_sniff.py:29-31).
"""

from __future__ import annotations

import csv
import io

SAMPLE_LINES = 10
DEFAULT_CANDIDATES = ",;|\t"


def _field_counts(sample_lines: list[str], delim: str) -> list[int]:
    reader = csv.reader(io.StringIO("\n".join(sample_lines)), delimiter=delim)
    return [len(row) for row in reader if row]


def sniff_delimiter(
    text: str,
    candidates: str = DEFAULT_CANDIDATES,
    default: str = ",",
) -> str:
    """Pick the delimiter for ``text`` from ``candidates``."""
    lines = [ln for ln in text.strip("\n").splitlines() if ln.strip()][:SAMPLE_LINES]
    if not lines:
        return default
    best, best_cols = default, 1
    for cand in candidates:
        counts = _field_counts(lines, cand)
        if not counts or len(set(counts)) != 1:
            continue  # ragged rows disqualify the candidate
        if counts[0] > best_cols:
            best, best_cols = cand, counts[0]
    return best
