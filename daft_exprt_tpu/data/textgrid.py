"""Minimal Praat TextGrid reader (long text format, as written by MFA).

Replaces the reference's ``tgt`` dependency for ingesting Montreal
Forced Aligner output (/root/reference/src/daft_exprt/mfa.py:82-88 uses
tgt.io.read_textgrid with include_empty_intervals=True). Only interval
tiers are needed; empty intervals are always included.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class Interval:
    start_time: float
    end_time: float
    text: str


@dataclass
class IntervalTier:
    name: str
    intervals: list = field(default_factory=list)


_KV_NUM = re.compile(r"^\s*(xmin|xmax|number)\s*=\s*(-?\d+(?:\.\d+)?"
                     r"(?:e-?\d+)?)\s*$", re.IGNORECASE)
_KV_STR = re.compile(r'^\s*(class|name|text|mark)\s*=\s*"((?:[^"]|"")*)"'
                     r"\s*$", re.IGNORECASE)


def read_textgrid(path: str) -> dict:
    """Parse a long-format TextGrid file -> {tier_name: IntervalTier}.

    Interval tiers only (point tiers are skipped); empty intervals are
    included. Robust to the ``item [k]:`` / ``intervals [k]:`` index
    lines: values are keyed by name, not position.
    """
    with open(path, encoding="utf-8") as f:
        lines = f.readlines()

    tiers: dict[str, IntervalTier] = {}
    cur_class = None
    cur_tier = None
    last_xmin = last_xmax = 0.0
    for line in lines:
        m = _KV_STR.match(line)
        if m:
            key = m.group(1).lower()
            val = m.group(2).replace('""', '"')
            if key == "class":
                cur_class = val
            elif key == "name":
                if cur_class == "IntervalTier":
                    cur_tier = IntervalTier(val)
                    tiers[val] = cur_tier
                else:
                    cur_tier = None  # point tier: skip its entries
            elif key == "text" and cur_tier is not None:
                cur_tier.intervals.append(
                    Interval(last_xmin, last_xmax, val))
            # "mark" (point tiers) is ignored
            continue
        m = _KV_NUM.match(line)
        if m:
            key = m.group(1).lower()
            val = float(m.group(2))
            if key == "xmin":
                last_xmin = val
            elif key == "xmax":
                last_xmax = val
            # "number" (point tiers) is ignored
    return tiers
