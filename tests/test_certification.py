"""Certification-rotation governance: the driver certifies the first
50 registered queries per round, so all_queries() must order
not-yet-certified queries first — and, since round 5, a query whose
IMPLEMENTATION changed after its green driver row must rotate back
into the uncertified head (round-4 verdict: q42 was rewritten onto
the narrowing machinery but kept its stale r02 certification because
rotation keyed on name alone). No Spark session needed — this is
pure ordering logic."""

from __future__ import annotations

import json
import os

from vnavc_spark.queries import (
    ORACLE,
    QUERIES,
    _certified_fingerprints,
    _is_certified,
    impl_fingerprint,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAP_PATH = os.path.join(ROOT, "docs", "CERT_FINGERPRINTS.json")


def test_snapshot_exists_and_covers_registry():
    # every registered query carries a snapshot entry (the tool
    # records all names; certification still requires a driver row)
    snap = _certified_fingerprints()
    assert snap, "docs/CERT_FINGERPRINTS.json missing or empty"
    missing = sorted(set(QUERIES) - set(snap))
    assert not missing, (
        "queries missing from the fingerprint snapshot — run "
        f"tools/update_fingerprints.py: {missing}"
    )


def test_fingerprint_covers_source_and_oracle():
    name = next(iter(QUERIES))
    base = impl_fingerprint(name)
    # same inputs → same fingerprint (deterministic)
    assert impl_fingerprint(name) == base
    # the oracle SQL is part of the fingerprint: a changed oracle
    # must re-certify even if the Spark source is untouched
    oracle_name = next(iter(ORACLE))
    orig = ORACLE[oracle_name]
    try:
        before = impl_fingerprint(oracle_name)
        ORACLE[oracle_name] = orig + " -- changed"
        assert impl_fingerprint(oracle_name) != before
    finally:
        ORACLE[oracle_name] = orig


def test_changed_implementation_rotates_to_uncertified_head():
    certified = frozenset({"qA", "qB"})
    snap = {"qA": "fp-A-certified", "qB": "fp-B-certified"}

    def fp(name):
        # qB's implementation changed since its green row
        return {"qA": "fp-A-certified", "qB": "fp-B-NEW"}[name]

    assert _is_certified("qA", certified, snap, fp) is True
    assert _is_certified("qB", certified, snap, fp) is False
    # never-certified names are uncertified regardless of snapshot
    assert _is_certified("qC", certified, snap, fp) is False


def test_empty_snapshot_degrades_to_name_only():
    certified = frozenset({"qA"})
    assert _is_certified("qA", certified, {}, lambda n: "x") is True
    assert _is_certified("qB", certified, {}, lambda n: "x") is False


def test_live_registry_mutation_moves_query_to_head():
    # end-to-end over the real snapshot file: flip one certified
    # query's stored fingerprint (simulating a re-implementation)
    # and check all_queries() puts it first
    from vnavc_spark import queries as qmod

    with open(SNAP_PATH) as fh:
        snap = json.load(fh)
    # pick a certified query that currently matches its snapshot
    name = next(
        k
        for k in qmod.QUERIES
        if k in qmod._DRIVER_CERTIFIED
        and snap.get(k) == impl_fingerprint(k)
    )
    mutated = dict(snap)
    mutated[name] = "0" * 64
    orig_loader = qmod._certified_fingerprints
    qmod._certified_fingerprints = lambda: mutated
    try:
        order = list(qmod.all_queries())
        head_size = sum(
            1
            for k in order
            if not _is_certified(
                k, qmod._DRIVER_CERTIFIED, mutated, impl_fingerprint
            )
        )
        assert order.index(name) < head_size
        assert order[0] == name or name in order[:head_size]
    finally:
        qmod._certified_fingerprints = orig_loader
