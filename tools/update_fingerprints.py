"""Regenerate docs/CERT_FINGERPRINTS.json — the per-query
implementation-fingerprint snapshot the certification rotation keys
on (vnavc_spark/queries.py::_is_certified).

Run AFTER a round's CORRECTNESS_r*.json artifact lands, so the
snapshot records the implementation the driver actually certified.
A query whose implementation (source, oracle SQL, or any transitive
vnavc_spark dependency — regime 2) changes after that sorts back
into the uncertified-first head of all_queries() and re-enters the
driver's 50-query certification window automatically.

Safety (round-5 ADVICE, medium): a CHANGED fingerprint is only
re-stamped when the NEWEST CORRECTNESS_r*.json carries a green row
for that query — otherwise an unverified rewrite would be silently
marked certified, reintroducing the q42 stale-certification bug this
snapshot exists to prevent. Refused names keep their old stamp (so
they stay rotated into the uncertified head) unless --force.

Regime migrations are the one legitimate no-evidence restamp: when
the stored ``__regime__`` differs from the current
``queries.FP_REGIME``, every hash differs by construction. A name
whose OLD-regime fingerprint still matches the old snapshot has
unchanged code, so its certification transfers to the new regime.

Usage: python tools/update_fingerprints.py [--force]
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SNAP_PATH = os.path.join(ROOT, "docs", "CERT_FINGERPRINTS.json")


def newest_green_rows() -> set[str]:
    """Names with a green row (full hash match, or the documented
    rows-only ``no_oracle`` path) in the newest CORRECTNESS_r*.json."""
    paths = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
    if not paths:
        return set()
    with open(paths[-1]) as fh:
        data = json.load(fh)
    green: set[str] = set()
    for k, v in data.items():
        if not isinstance(v, dict):
            continue
        if v.get("hash_match") is True or (
            v.get("err") == "no_oracle" and v.get("spark_rows") is not None
        ):
            green.add(k)
    return green


def main() -> None:
    from vnavc_spark.queries import (
        FP_REGIME,
        QUERIES,
        _impl_fingerprint_v1,
        impl_fingerprint,
    )

    force = "--force" in sys.argv[1:]
    old: dict[str, object] = {}
    try:
        with open(SNAP_PATH) as fh:
            old = json.load(fh)
    except Exception:
        pass
    old_regime = old.pop("__regime__", 1)
    old_fps = {k: v for k, v in old.items() if isinstance(v, str)}

    legacy = {1: _impl_fingerprint_v1}.get(old_regime)
    green = newest_green_rows()

    new: dict[str, object] = {"__regime__": FP_REGIME}
    added, refreshed, migrated, refused = [], [], [], []
    for name in sorted(QUERIES):
        fp = impl_fingerprint(name)
        if name not in old_fps:
            new[name] = fp
            added.append(name)
            continue
        if old_fps[name] == fp:
            new[name] = fp
            continue
        # changed hash: regime migration, fresh green row, or refusal
        if (
            old_regime != FP_REGIME
            and legacy is not None
            and legacy(name) == old_fps[name]
        ):
            new[name] = fp
            migrated.append(name)
        elif name in green or force:
            new[name] = fp
            refreshed.append(name)
        else:
            new[name] = old_fps[name]
            refused.append(name)

    with open(SNAP_PATH, "w") as fh:
        json.dump(new, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {SNAP_PATH}: {len(new) - 1} fingerprints, regime {FP_REGIME}")
    if added:
        print(f"added ({len(added)}): {added}")
    if migrated:
        print(
            f"migrated regime {old_regime}->{FP_REGIME}, code unchanged "
            f"({len(migrated)}): {migrated}"
        )
    if refreshed:
        print(
            "refreshed (changed, green row in newest CORRECTNESS or "
            f"--force) ({len(refreshed)}): {refreshed}"
        )
    if refused:
        print(
            f"REFUSED ({len(refused)}) — changed since last stamp with no "
            "green row in the newest CORRECTNESS artifact; kept the old "
            "stamp so these stay in the uncertified head (use --force to "
            f"override): {refused}"
        )


if __name__ == "__main__":
    main()
