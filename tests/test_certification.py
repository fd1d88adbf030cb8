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


# ---------------------------------------------------------------------------
# regime 2: operator-dependency closure (round-5 verdict item #2 —
# the pps_systematic guard changed q132's plan without rotating it)
# ---------------------------------------------------------------------------


def test_dep_closure_reaches_local_imports_and_module_attrs():
    from vnavc_spark import queries as qmod

    # q132 pulls pps_systematic via a function-LOCAL import
    c132 = qmod.dep_closure(qmod.QUERIES["q132_pps_sample"])
    assert "vnavc_spark.operators.sampling.pps_systematic" in c132
    # q131 reaches its operator through module-attribute access
    # (graph.triangle_stats) and a queries.py-local helper
    c131 = qmod.dep_closure(qmod.QUERIES["q131_triangle_count"])
    assert "vnavc_spark.operators.graph.triangle_stats" in c131
    assert "vnavc_spark.queries._basket_pair_counts" in c131


def test_dep_closure_excludes_other_queries():
    # a query's closure must never include ANOTHER query function —
    # otherwise editing q01 would rotate unrelated certifications
    from vnavc_spark import queries as qmod

    for name in list(qmod.QUERIES)[:30]:
        closure = qmod.dep_closure(qmod.QUERIES[name])
        leaked = [
            k
            for k in closure
            if k.split(".")[-1] in qmod.QUERIES and k.split(".")[-1] != name
        ]
        assert not leaked, f"{name} closure leaked queries: {leaked}"


def test_operator_edit_rotates_dependent_query():
    # simulate an edit to operators/sampling.pps_systematic via the
    # _source_of seam: q132's fingerprint must change (it would
    # rotate back into the driver window); q01's must not
    from vnavc_spark import queries as qmod
    from vnavc_spark.operators.sampling import pps_systematic

    qmod._FP_CACHE.clear()
    before_132 = impl_fingerprint("q132_pps_sample")
    before_01 = impl_fingerprint("q01_region_revenue")
    orig = qmod._source_of

    def edited(obj):
        src = orig(obj)
        if obj is pps_systematic:
            return src + "\n# simulated operator edit"
        return src

    qmod._source_of = edited
    qmod._FP_CACHE.clear()
    try:
        assert impl_fingerprint("q132_pps_sample") != before_132
        assert impl_fingerprint("q01_region_revenue") == before_01
    finally:
        qmod._source_of = orig
        qmod._FP_CACHE.clear()


def _load_tool(modname="update_fingerprints"):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        modname, os.path.join(ROOT, "tools", "update_fingerprints.py")
    )
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    return tool


def test_update_tool_refuses_changed_without_green_row(tmp_path):
    # the tool must not re-stamp a changed fingerprint unless the
    # NEWEST CORRECTNESS artifact carries a green row for that name
    # (round-5 ADVICE, medium). Derive in/out-of-window names from
    # the artifact itself — window composition shifts every round
    # (round-6 ADVICE #8: the q51 hardcode broke the round it rotated
    # in).
    from vnavc_spark.queries import FP_REGIME

    tool = _load_tool()
    green = tool.newest_green_rows()
    in_window = next(k for k in QUERIES if k in green)
    out_window = next(k for k in QUERIES if k not in green)

    snap = tmp_path / "CERT_FINGERPRINTS.json"
    fake = {
        "__regime__": FP_REGIME,
        in_window: "0" * 64,
        out_window: "1" * 64,
    }
    snap.write_text(json.dumps(fake))
    tool.SNAP_PATH = str(snap)
    # the in-window query is unchanged vs the tested tree here (its
    # CURRENT fp matches what the driver certified), so evidence holds
    tool.tested_tree_fingerprints = lambda names, regime: {
        n: impl_fingerprint(n) for n in names
    }
    tool.main()
    out = json.loads(snap.read_text())
    assert out[in_window] == impl_fingerprint(in_window)
    assert out[out_window] == "1" * 64, "re-stamped without evidence"
    assert out["__regime__"] == FP_REGIME
    # every registered query got an entry; refused one stays stale
    assert set(QUERIES) <= set(out)


def test_update_tool_refuses_stale_green_evidence(tmp_path):
    # round-6 ADVICE (medium): a green row certifies the tree the
    # driver RAN, not the current one. If the query changed again
    # after that tree, the row is stale evidence and the re-stamp
    # must be refused even though the name is green.
    from vnavc_spark.queries import FP_REGIME

    tool = _load_tool("update_fingerprints_stale")
    green = tool.newest_green_rows()
    victim = next(k for k in QUERIES if k in green)

    snap = tmp_path / "CERT_FINGERPRINTS.json"
    snap.write_text(json.dumps({"__regime__": FP_REGIME, victim: "0" * 64}))
    tool.SNAP_PATH = str(snap)
    # tested tree had yet ANOTHER fingerprint -> current impl was
    # never certified by the green row
    tool.tested_tree_fingerprints = lambda names, regime: {
        n: "2" * 64 for n in names
    }
    tool.main()
    out = json.loads(snap.read_text())
    assert out[victim] == "0" * 64, "stale green row honoured"


def test_update_tool_fixed_point(tmp_path):
    # fixed-point form of the idempotence guarantee (round-6 verdict
    # item #1): the FIRST regeneration over the committed snapshot may
    # legitimately refresh entries (the driver lands CORRECTNESS
    # artifacts AFTER the end-of-round commit), but a SECOND
    # regeneration immediately after must be a no-op.
    import shutil

    tool = _load_tool("update_fingerprints_fp")
    snap = tmp_path / "CERT_FINGERPRINTS.json"
    shutil.copy(SNAP_PATH, snap)
    tool.SNAP_PATH = str(snap)
    tool.main()
    first = json.loads(snap.read_text())
    tool.main()
    assert json.loads(snap.read_text()) == first


def _run_check(tool):
    import sys

    argv = sys.argv
    sys.argv = ["update_fingerprints.py", "--check"]
    try:
        tool.main()  # sys.exit(1) raises SystemExit
    finally:
        sys.argv = argv


def test_update_tool_check_mode_on_current_snapshot():
    # --check must pass on the committed snapshot in BOTH legitimate
    # states: fixed point (mid-round, just regenerated) AND pending
    # evidence-backed refreshes (a driver CORRECTNESS artifact landed
    # after the last regeneration and certifies the current
    # implementations). Round-7 verdict item #1: the old fixed-point-
    # only form was red exactly when the judge ran the suite, three
    # rounds running.
    tool = _load_tool("update_fingerprints_chk")
    before = open(SNAP_PATH).read()
    _run_check(tool)
    assert open(SNAP_PATH).read() == before


def test_check_mode_passes_on_evidence_backed_pending(tmp_path):
    # simulate the round-boundary state: one green name's stamp is
    # stale, but the tested tree certifies the CURRENT implementation
    # — pending mechanical refresh, not drift, so --check exits 0
    tool = _load_tool("update_fingerprints_chk_pend")
    green = tool.newest_green_rows()
    victim = next(k for k in QUERIES if k in green)
    with open(SNAP_PATH) as fh:
        snap = json.load(fh)
    snap[victim] = "0" * 64
    p = tmp_path / "CERT_FINGERPRINTS.json"
    p.write_text(json.dumps(snap))
    tool.SNAP_PATH = str(p)
    tool.tested_tree_fingerprints = lambda names, regime: {
        n: impl_fingerprint(n) for n in names
    }
    _run_check(tool)  # SystemExit would fail the test
    assert json.loads(p.read_text())[victim] == "0" * 64  # check never writes


def test_check_mode_fails_on_unexplained_drift(tmp_path):
    # a name with NO stamp at all (query registered without running
    # the tool) is unexplained drift -> exit 1
    import pytest

    tool = _load_tool("update_fingerprints_chk_fail")
    with open(SNAP_PATH) as fh:
        snap = json.load(fh)
    dropped = next(k for k in QUERIES if k in snap)
    del snap[dropped]
    p = tmp_path / "CERT_FINGERPRINTS.json"
    p.write_text(json.dumps(snap))
    tool.SNAP_PATH = str(p)
    with pytest.raises(SystemExit):
        _run_check(tool)


def test_untracked_artifact_verifies_against_head(tmp_path):
    # round-7 verdict item #3: when the newest CORRECTNESS artifact is
    # UNTRACKED (the driver ran at HEAD and dropped it on top), the
    # evidence check must verify against HEAD rather than degrade to
    # name-only — an implementation edited AFTER the driver ran must
    # NOT inherit the green row.
    from vnavc_spark import queries as qmod
    from vnavc_spark.queries import FP_REGIME

    tool = _load_tool("update_fingerprints_head")
    green = tool.newest_green_rows()
    victim = next(k for k in QUERIES if k in green)
    fake_art = os.path.join(ROOT, "CORRECTNESS_r999.json")
    snap = tmp_path / "CERT_FINGERPRINTS.json"
    snap.write_text(json.dumps({"__regime__": FP_REGIME, victim: "0" * 64}))
    tool.SNAP_PATH = str(snap)
    orig = qmod._source_of

    def edited(obj):
        src = orig(obj)
        if obj is qmod.QUERIES[victim]:
            return src + "\n# edited after the driver ran"
        return src

    with open(fake_art, "w") as fh:
        json.dump({victim: {"hash_match": True}}, fh)
    qmod._source_of = edited
    qmod._FP_CACHE.clear()
    try:
        assert tool.newest_artifact_path() == fake_art
        tool.main()  # real tested_tree_fingerprints -> HEAD worktree
        out = json.loads(snap.read_text())
        assert out[victim] == "0" * 64, (
            "edited implementation inherited an untracked artifact's "
            "green row (name-only fallback reachable)"
        )
    finally:
        qmod._source_of = orig
        qmod._FP_CACHE.clear()
        os.unlink(fake_art)


def test_certified_tail_ordered_stalest_green_first():
    # round-9 verdict item #3: with the whole registry certified, the
    # tail must order by OLDEST green driver row first so leftover
    # window slots re-certify the stalest queries (age-based
    # rotation); ties keep registration order, so the ordering is
    # deterministic across processes.
    import vnavc_spark.queries as qmod

    order = qmod._certification_order(QUERIES)
    snapshot = _certified_fingerprints()
    cert = {
        k: _is_certified(
            k, qmod._DRIVER_CERTIFIED, snapshot, impl_fingerprint
        )
        for k in QUERIES
    }
    # head (uncertified) strictly precedes every certified query
    tail_start = 0
    for i, k in enumerate(order):
        if not cert[k]:
            assert tail_start == i, "uncertified query after the tail began"
            tail_start = i + 1
    age = qmod._latest_green_round()
    reg_idx = {k: i for i, k in enumerate(QUERIES)}
    tail = order[tail_start:]
    keys = [(age.get(k, 0), reg_idx[k]) for k in tail]
    assert keys == sorted(keys), (
        "certified tail is not ordered by (oldest green round, "
        "registration index)"
    )
    # the rotation must actually mix rounds once >1 round of greens
    # exists (guards against the cache degenerating to one age)
    if len({a for a, _i in keys}) > 1:
        assert keys[0][0] < keys[-1][0]
