#!/usr/bin/env python
"""Certification-window composition report: who occupies the driver's
50-slot window THIS round and why, plus the evidence-age profile of
the whole registry — the numbers the round log's "N forced + M
rotation" claims cite, generated instead of hand-counted (they were
recomputed by hand four times in round 10 alone).

Usage: python tools/window_math.py [--window 50]

Reads the same inputs the registry ordering itself uses
(CORRECTNESS_r*.json green rows, docs/CERT_FINGERPRINTS.json,
registration order), so the report IS the driver's head by
construction, not a parallel reimplementation.
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    from vnavc_spark.queries import (
        _DRIVER_CERTIFIED,
        _certified_fingerprints,
        _is_certified,
        _latest_green_round,
        all_queries,
        impl_fingerprint,
    )

    names = list(all_queries())  # certification order
    snapshot = _certified_fingerprints()
    ages = _latest_green_round()

    never = []
    stale = []
    for n in names:
        if _is_certified(n, _DRIVER_CERTIFIED, snapshot, impl_fingerprint):
            continue
        (stale if n in _DRIVER_CERTIFIED else never).append(n)
    forced = never + stale
    window = names[: args.window]
    rotation = [n for n in window if n not in forced]

    print(f"registry: {len(names)} queries; window: {args.window}")
    print(f"forced head: {len(forced)}")
    print(f"  never certified ({len(never)}): {never}")
    print(f"  stale fingerprint ({len(stale)}): {stale}")
    print(f"rotation slots: {len(rotation)}")
    rot_ages = Counter(ages.get(n, 2) for n in rotation)
    print(f"  rotation evidence ages (round -> n): {dict(sorted(rot_ages.items()))}")
    left_out = [
        n
        for n in names[args.window:]
        if n not in forced
    ]
    tail_ages = Counter(ages.get(n, 2) for n in left_out)
    print(f"outside the window: {len(left_out)} certified queries")
    print(f"  their evidence ages (round -> n): {dict(sorted(tail_ages.items()))}")
    overflow = [n for n in forced if n not in window]
    if overflow:
        print(
            f"WARNING: {len(overflow)} forced queries OVERFLOW the "
            f"window and will not certify this round: {overflow}"
        )


if __name__ == "__main__":
    main()
