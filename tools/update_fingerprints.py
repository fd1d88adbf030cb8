"""Regenerate docs/CERT_FINGERPRINTS.json — the per-query
implementation-fingerprint snapshot the certification rotation keys
on (vnavc_spark/queries.py::_is_certified).

Run AFTER a round's CORRECTNESS_r*.json artifact lands, so the
snapshot records the source text the driver actually certified. A
query whose source (or oracle SQL) changes after that sorts back
into the uncertified-first head of all_queries() and re-enters the
driver's 50-query certification window automatically.

Usage: python tools/update_fingerprints.py
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    from vnavc_spark.queries import QUERIES, impl_fingerprint

    path = os.path.join(ROOT, "docs", "CERT_FINGERPRINTS.json")
    old: dict[str, str] = {}
    try:
        with open(path) as fh:
            old = json.load(fh)
    except Exception:
        pass
    new = {name: impl_fingerprint(name) for name in sorted(QUERIES)}
    changed = sorted(
        k for k in new if k in old and old[k] != new[k]
    )
    added = sorted(k for k in new if k not in old)
    with open(path, "w") as fh:
        json.dump(new, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {path}: {len(new)} fingerprints")
    if changed:
        print(f"refreshed (source changed since last snapshot): {changed}")
    if added:
        print(f"added: {added}")


if __name__ == "__main__":
    main()
