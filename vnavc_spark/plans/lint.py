"""Static lints for plan-level footguns.

Currently one rule: the CHAINED-CHECKPOINT loop. ``Dataset.
localCheckpoint`` captures the origin plan's statistics into the
resulting LogicalRDD, and basic (non-CBO) join stats MULTIPLY the
children's sizeInBytes — so a loop of the form::

    labels = step(labels).localCheckpoint()

grows the captured sizeInBytes doubly-exponentially (million-digit
BigInt arithmetic inside every stats-consuming optimizer rule by ~10
rounds; executors idle, pure driver burn — the round-11 q209 find,
see :func:`vnavc_spark.cache.severed_local_checkpoint`). The fix is
to route loop checkpoints through ``severed_local_checkpoint``; this
lint keeps the footgun from being re-created by a future operator.

The rule is deliberately narrow (no false positives on the sanctioned
patterns in this repo): inside a ``for``/``while`` body, flag an
assignment whose value calls ``.localCheckpoint()`` / ``.checkpoint()``
AND references the assignment target itself — i.e. the checkpointed
plan derives from the previous iteration's checkpoint. Checkpoints of
FRESH plans in a loop (q154's per-chunk staging: the target never
appears on the right-hand side) and one-shot lineage cuts outside
loops are fine and not flagged. Known limitation: an indirect chain
through a temporary (``y = step(x).localCheckpoint(); x = y``) is not
caught — the rule is a tripwire for the common spelling, not a full
dataflow analysis.
"""
from __future__ import annotations

import ast
from pathlib import Path

_CHECKPOINT_METHODS = {"localCheckpoint", "checkpoint"}


def _target_names(node: ast.AST) -> set[str]:
    """Plain names bound by an assignment target (tuples unpacked)."""
    out: set[str] = set()
    for n in ast.walk(node):
        if isinstance(n, ast.Name):
            out.add(n.id)
    return out


def _calls_checkpoint(node: ast.AST) -> bool:
    return any(
        isinstance(n, ast.Call)
        and isinstance(n.func, ast.Attribute)
        and n.func.attr in _CHECKPOINT_METHODS
        for n in ast.walk(node)
    )


def _names_read(node: ast.AST) -> set[str]:
    return {
        n.id
        for n in ast.walk(node)
        if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
    }


def chained_checkpoint_sites(
    source: str, filename: str = "<string>"
) -> list[str]:
    """Return ``"filename:lineno: var"`` for every self-chained
    checkpoint assignment inside a loop body in ``source``."""
    tree = ast.parse(source, filename=filename)
    sites: list[str] = []
    for loop in ast.walk(tree):
        if not isinstance(loop, (ast.For, ast.While)):
            continue
        for stmt in ast.walk(loop):
            if isinstance(stmt, ast.Assign):
                targets = set().union(
                    *(_target_names(t) for t in stmt.targets)
                )
                value = stmt.value
            elif isinstance(stmt, ast.AugAssign):
                targets = _target_names(stmt.target)
                value = stmt.value
            else:
                continue
            if not _calls_checkpoint(value):
                continue
            chained = targets & _names_read(value)
            if chained:
                sites.append(
                    f"{filename}:{stmt.lineno}: {', '.join(sorted(chained))}"
                )
    return sites


def scan_package(root: str | Path) -> list[str]:
    """Run :func:`chained_checkpoint_sites` over every ``.py`` file
    under ``root``; returns all flagged sites (empty = clean)."""
    sites: list[str] = []
    for path in sorted(Path(root).rglob("*.py")):
        sites.extend(
            chained_checkpoint_sites(
                path.read_text(encoding="utf-8"), str(path)
            )
        )
    return sites
