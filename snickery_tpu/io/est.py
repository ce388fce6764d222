"""EST_File pitchmark (.pm) reader/writer.

The reference consumes REAPER/Edinburgh Speech Tools pitchmark files — ASCII
``EST_File Track`` headers followed by one time-per-line records (SURVEY.md
§3.1; unverified, mount empty).  We parse both ASCII EST tracks and plain
one-time-per-line text files, returning epoch positions in *samples*.
"""

from __future__ import annotations

import numpy as np


def read_est_pitchmarks(path: str, sample_rate: int) -> np.ndarray:
    """Read pitchmarks -> int32 sample positions (sorted, deduplicated).

    Handles:
    - EST_File Track ASCII: header until ``EST_Header_End``, then lines of
      ``<time_sec> <flag> [value]``.
    - Bare text: one ``<time_sec>`` (or ``<time_sec> <flag>``) per line.
    Negative-time marks (REAPER emits some) are dropped.
    """
    times: list[float] = []
    with open(path, "rb") as f:
        raw = f.read()
    text = raw.decode("latin-1")
    lines = text.splitlines()
    in_header = False
    header_seen = False
    for ln in lines:
        s = ln.strip()
        if not s:
            continue
        if s.startswith("EST_File"):
            in_header = True
            header_seen = True
            continue
        if in_header:
            if s.startswith("EST_Header_End"):
                in_header = False
            continue
        parts = s.split()
        try:
            t = float(parts[0])
        except ValueError:
            continue
        # REAPER .pm format is "<time> <voicing> <value>"; when a voicing flag
        # is present keep only voiced==1 ... but epoch-based snickery uses all
        # marks as waveform anchor points, so we keep every non-negative time.
        if t >= 0.0:
            times.append(t)
    del header_seen
    samples = np.unique(np.round(np.asarray(times, dtype=np.float64) * sample_rate)).astype(np.int32)
    return samples


def write_est_pitchmarks(sample_positions: np.ndarray, path: str, sample_rate: int) -> None:
    """Write sample positions as an ASCII EST track (round-trips with the reader)."""
    times = np.asarray(sample_positions, dtype=np.float64) / float(sample_rate)
    with open(path, "w") as f:
        f.write("EST_File Track\n")
        f.write("DataType ascii\n")
        f.write(f"NumFrames {len(times)}\n")
        f.write("NumChannels 0\n")
        f.write("EqualSpace 0\n")
        f.write("BreaksPresent true\n")
        f.write("EST_Header_End\n")
        for t in times:
            f.write(f"{t:.6f} 1 1\n")
