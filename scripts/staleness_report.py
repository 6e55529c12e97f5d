#!/usr/bin/env python
"""Staleness audit: driver-green rows older than the query's last rewrite.

VERDICT r5 task 8: a green CORRECTNESS row describes the code that
ran WHEN THE ROW WAS RECORDED.  If the builder (or its oracle) was
rewritten afterwards, the row is evidence about superseded code and
the query must rotate back through the driver gate (FORCE_RECHECK for
semantics changes, SOFT_RECHECK for plan-only rewrites).

Method: for every registered query whose latest green row came from
round N, diff the query's builder-function source (decorator included,
so the oracle SQL string counts) between the round-N end-of-round
snapshot commit and the working tree.  Function-level granularity —
a module-level edit elsewhere in the file does not flag the query.
Known limitation, stated rather than hidden: a rewrite of a HELPER
the builder calls (shared SQL fragment, module constant) is invisible
here; those cases must be caught at edit time by updating
FORCE_RECHECK, which is exactly what r5/r6 did for q66 and the graph
family.

Output: one line per stale query + a summary line suitable for
COVERAGE.md.  Exit code 1 if any stale query is NOT already queued
for recheck (FORCE_RECHECK / SOFT_RECHECK / never-checked).
"""

from __future__ import annotations

import ast
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from flaco_spark.inventory import (  # noqa: E402
    _last_green_round,
    load_inventory,
)


def snapshot_commits() -> dict[int, str]:
    """round number -> commit whose tree the round's greens describe.

    Primary anchor: the explicit ``round N: end-of-round snapshot``
    commit — the tree at builder-session end, which is what the
    driver's CORRECTNESS run measures.  Fallback, for rounds with no
    snapshot commit (r1, r2, r6 — before r7 their rows were silently
    SKIPPED): the first parent of the driver's ``round N:
    verdict/advice/correctness/bench`` commit.  The fallback can be
    slightly LATE — judging runs for hours and the next round's
    builder may commit in that window (r3's verdict parent is 6 h of
    r4 work past its snapshot), which would hide a rewrite landing in
    the overlap; for the fallback rounds that window is 0 commits
    (r6) to ≤2 new-query-only commits (r1/r2), so the residual risk
    is documented rather than material.
    """
    log = subprocess.run(
        ["git", "log", "--format=%H %s"],
        cwd=ROOT,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    out: dict[int, str] = {}
    fallback: dict[int, str] = {}
    for line in log.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): end-of-round snapshot", subject)
        if m:
            out.setdefault(int(m.group(1)), sha)  # first seen = latest
            continue
        m = re.match(r"round (\d+): verdict/", subject)
        if m:
            parent = subprocess.run(
                ["git", "rev-parse", f"{sha}^"],
                cwd=ROOT,
                capture_output=True,
                text=True,
            )
            if parent.returncode == 0:
                fallback.setdefault(int(m.group(1)), parent.stdout.strip())
    for rnd, sha in fallback.items():
        out.setdefault(rnd, sha)
    return out


def fn_source(tree: ast.Module, src: str, fn_name: str) -> str | None:
    """Source segment of a top-level function incl. decorators."""
    lines = src.splitlines()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if node.name == fn_name:
                start = min(
                    [d.lineno for d in node.decorator_list] + [node.lineno]
                )
                return "\n".join(lines[start - 1 : node.end_lineno])
    return None


def main() -> int:
    import inspect

    registry = load_inventory()
    seen = _last_green_round()
    snaps = snapshot_commits()

    stale: list[tuple[str, int, str]] = []
    missing_snapshot = set()
    for name, spec in registry.items():
        rnd = seen.get(name)
        if rnd is None:
            continue  # never green: already queued first by load_inventory
        sha = snaps.get(rnd)
        if sha is None:
            missing_snapshot.add(rnd)
            continue
        try:
            fn = spec.builder
            file = Path(inspect.getsourcefile(fn)).resolve()
            rel = file.relative_to(ROOT)
        except (TypeError, ValueError):
            continue
        cur_src = file.read_text()
        cur = fn_source(ast.parse(cur_src), cur_src, fn.__name__)
        old_file = subprocess.run(
            ["git", "show", f"{sha}:{rel}"],
            cwd=ROOT,
            capture_output=True,
            text=True,
        )
        if old_file.returncode != 0:
            stale.append((name, rnd, "file absent at green-round snapshot"))
            continue
        try:
            old = fn_source(ast.parse(old_file.stdout), old_file.stdout, fn.__name__)
        except SyntaxError:
            old = None
        if old is None:
            stale.append((name, rnd, "builder absent at green-round snapshot"))
        elif old != cur:
            stale.append((name, rnd, "builder source changed since green row"))

    # "queued" means the pin is ACTIVE: a pin already satisfied by a
    # green row in a round >= its pin round no longer rotates the
    # query forward, so a stale green behind such a pin counts as
    # unqueued (it needs a NEW pin with the current round number).
    from flaco_spark.inventory import active_pins

    force_active, soft_active = active_pins(seen)
    for name, rnd, why in stale:
        queued = (
            "FORCE_RECHECK"
            if name in force_active
            else "SOFT_RECHECK"
            if name in soft_active
            else "NOT QUEUED"
        )
        print(f"stale: {name} (green r{rnd}) — {why} [{queued}]")
    unqueued = [
        n for n, _, _ in stale if n not in force_active and n not in soft_active
    ]
    n_green = len([n for n in registry if n in seen])
    print(
        f"# staleness: {len(stale)}/{n_green} green rows predate their builder's "
        f"last rewrite; {len(unqueued)} not queued for recheck"
        + (f" -> {sorted(unqueued)}" if unqueued else "")
    )
    if missing_snapshot:
        print(
            f"# note: no end-of-round snapshot commit found for rounds "
            f"{sorted(missing_snapshot)}; those rows were skipped"
        )
    return 1 if unqueued else 0


if __name__ == "__main__":
    raise SystemExit(main())
