"""Compiled-HLO structure checks.

The distributed four-step's weak-scaling lever is comm/compute overlap:
the chunked pipeline (parallel/fourstep_dist.py) is built so chunk i+1's
column compute is *schedulable* between chunk i's all_to_alls. That is a
dependency property of the compiled program, checkable without multiple
real chips: if the chunks were accidentally serialized (chunk i+1's
compute consuming chunk i's collective output), every chunk would add a
collective to the critical path. These helpers parse HLO text into a
dependency graph and measure the maximum number of all_to_all
instructions on any dependency chain — 3 for the natural-order forward
(row->col, col->row, final transpose) REGARDLESS of chunk count when
the pipeline is overlap-capable, chunks+2 when serialized.

Reference analog: none (the reference is single-process); this hardens
the build's own north-star lever (SURVEY §7 "All-to-all transpose at
2^30": chunking the collective to overlap with per-shard compute).
"""

from __future__ import annotations

import re

__all__ = ["all_to_all_chain_depth"]

_DEF = re.compile(r"^\s*(?:ROOT\s+)?%([\w.\-]+)\s*=")
_REF = re.compile(r"%([\w.\-]+)")


def _entry_lines(hlo_text: str) -> list[str]:
    """Lines of the ENTRY computation only (fusion bodies have their own
    parameter namespaces; collectives are never fused, so the entry graph
    carries every all_to_all and its operand structure)."""
    lines = []
    in_entry = False
    for line in hlo_text.splitlines():
        if line.startswith("ENTRY"):
            in_entry = True
            continue
        if in_entry:
            if line.startswith("}"):
                break
            lines.append(line)
    return lines


def all_to_all_chain_depth(hlo_text: str) -> int:
    """Maximum number of all-to-all instructions on any dependency chain
    of the ENTRY computation (operands + control-predecessors).

    An overlap-capable chunked four-step keeps this at the number of
    PHASES (3 natural / 2 permuted), independent of the chunk count; a
    serialized pipeline grows it linearly with chunks."""
    lines = _entry_lines(hlo_text)
    deps: dict[str, list[str]] = {}
    is_a2a: dict[str, bool] = {}
    for line in lines:
        m = _DEF.match(line)
        if not m:
            continue
        name = m.group(1)
        refs = [r for r in _REF.findall(line) if r != name]
        deps[name] = refs
        is_a2a[name] = " all-to-all(" in line
    depth: dict[str, int] = {}

    def visit(name: str) -> int:
        if name in depth:
            return depth[name]
        depth[name] = 0  # cycle guard (HLO is a DAG; defensive)
        d = max((visit(r) for r in deps.get(name, ()) if r in deps),
                default=0)
        depth[name] = d + (1 if is_a2a.get(name) else 0)
        return depth[name]

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10000 + 10 * len(deps)))
    try:
        return max((visit(n) for n in deps), default=0)
    finally:
        sys.setrecursionlimit(old)
