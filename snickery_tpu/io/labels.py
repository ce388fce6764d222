"""HTS label reading and halfphone segmentation.

The reference's halfphone mode reads HTS-style alignment labels
(``<start> <end> <full-context-model>`` in 100ns HTK units, with state-level
sub-lines) to cut phones into left/right halves and to attach quinphone
context names used for linguistic preselection (SURVEY.md §2 rows 1,3;
unverified, mount empty).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

HTK_UNITS_PER_SEC = 10_000_000  # 100 ns

# Full-context label: ll^l-c+r=rr@... — extract the quinphone.
_QUINPHONE_RE = re.compile(r"^(.+?)\^(.+?)-(.+?)\+(.+?)=(.+?)[@/].*$")
_TRIPHONE_RE = re.compile(r"^(.+?)-(.+?)\+(.+?)$")


@dataclass
class PhoneSegment:
    start_sec: float
    end_sec: float
    phone: str                      # central phone
    quinphone: tuple[str, str, str, str, str]
    state_bounds_sec: list[float]   # interior state boundaries (may be empty)


def parse_context(model: str) -> tuple[str, tuple[str, str, str, str, str]]:
    """Extract (central phone, quinphone) from a full-context model name."""
    m = _QUINPHONE_RE.match(model)
    if m:
        ll, l, c, r, rr = m.groups()
        return c, (ll, l, c, r, rr)
    m = _TRIPHONE_RE.match(model)
    if m:
        l, c, r = m.groups()
        return c, ("xx", l, c, r, "xx")
    return model, ("xx", "xx", model, "xx", "xx")


def read_hts_label(path: str) -> list[PhoneSegment]:
    """Parse an HTS alignment label file into phone segments.

    Supports state-level alignment (lines carrying ``[2]``..``[6]`` state
    markers, or repeated model names): consecutive lines with the same model
    name are merged into one phone whose interior boundaries are kept as
    state bounds.
    """
    rows: list[tuple[float, float, str]] = []
    with open(path) as f:
        for ln in f:
            parts = ln.split()
            if len(parts) < 3:
                continue
            try:
                start = float(parts[0]) / HTK_UNITS_PER_SEC
                end = float(parts[1]) / HTK_UNITS_PER_SEC
            except ValueError:
                continue
            model = parts[2]
            model = re.sub(r"\[\d+\]$", "", model)  # strip state index marker
            rows.append((start, end, model))

    segments: list[PhoneSegment] = []
    for start, end, model in rows:
        phone, quin = parse_context(model)
        if segments and segments[-1].quinphone == quin and abs(segments[-1].end_sec - start) < 1e-9:
            seg = segments[-1]
            seg.state_bounds_sec.append(start)
            seg.end_sec = end
        else:
            segments.append(PhoneSegment(start, end, phone, quin, []))
    return segments


@dataclass
class HalfphoneSegment:
    start_sec: float
    end_sec: float
    name: str                       # e.g. "ae_L"
    phone: str
    half: str                       # "L" | "R"
    quinphone: tuple[str, str, str, str, str]


def halfphone_segments(
    phones: list[PhoneSegment],
    midpoint_from_states: bool = True,
) -> list[HalfphoneSegment]:
    """Split each phone into left/right halves.

    The split point is the middle state boundary when state alignment is
    available (HTS 5-state models split after state 3), else the temporal
    midpoint — matching the reference's halfphone construction as described
    in SURVEY.md §2 row 1 [M].
    """
    out: list[HalfphoneSegment] = []
    for seg in phones:
        if midpoint_from_states and len(seg.state_bounds_sec) >= 2:
            mid = seg.state_bounds_sec[len(seg.state_bounds_sec) // 2]
        else:
            mid = 0.5 * (seg.start_sec + seg.end_sec)
        mid = min(max(mid, seg.start_sec), seg.end_sec)
        out.append(HalfphoneSegment(seg.start_sec, mid, f"{seg.phone}_L",
                                    seg.phone, "L", seg.quinphone))
        out.append(HalfphoneSegment(mid, seg.end_sec, f"{seg.phone}_R",
                                    seg.phone, "R", seg.quinphone))
    return out


def segments_to_sample_bounds(
    segments: list[HalfphoneSegment] | list[PhoneSegment],
    sample_rate: int,
) -> np.ndarray:
    """(n, 2) int32 start/end sample bounds."""
    return np.asarray(
        [[round(s.start_sec * sample_rate), round(s.end_sec * sample_rate)] for s in segments],
        dtype=np.int32,
    )
