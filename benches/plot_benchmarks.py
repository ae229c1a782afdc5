#!/usr/bin/env python
"""Grouped-bar benchmark plots — analog of the reference's
benchmark_plots.py (/root/reference/benches/benchmark_plots.py): per-size
grouped bars of median time normalized to the Numpy median, with direct
value labels.

Reads the criterion-style sample tree written by the bench_* runners
(benches/out/<group>/<Series>/<n>.json) and writes one PNG per group.

Color: fixed categorical order per series identity (never cycled), palette
validated for CVD separation + lightness band (dataviz six-checks; the two
advisory WARNs — one adjacent CVD pair in the 6-8 band and sub-3:1
contrast for two fills — are discharged by the direct value labels on
every bar). Single hue family per series across groups.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches import common  # noqa: E402

# fixed series -> color assignment (identity, not rank)
SERIES_COLORS = {
    "PhastftTpu": "#0072B2",
    "Numpy": "#E69F00",
    "Scipy": "#009E73",
    "Torch": "#D55E00",
    "Heuristic": "#0072B2",
    "Tune": "#CC79A7",
    "Native": "#0072B2",
    "Other": "#CC79A7",
}
TEXT = "#333333"
MUTED = "#777777"


def load_group(group: str):
    gdir = os.path.join(common.OUT_DIR, group)
    if not os.path.isdir(gdir):
        return {}
    data = {}
    for series in sorted(os.listdir(gdir)):
        sdir = os.path.join(gdir, series)
        samples = {}
        for fn in os.listdir(sdir):
            if fn.endswith(".json"):
                with open(os.path.join(sdir, fn)) as f:
                    d = json.load(f)
                samples[d["n"]] = d
        if samples:
            data[series] = samples
    return data


def plot_group(group: str, data, out_dir: str, baseline: str = "Numpy"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sizes = sorted(set().union(*[set(s) for s in data.values()]))
    series_names = [s for s in SERIES_COLORS if s in data] + [
        s for s in data if s not in SERIES_COLORS
    ]
    base = {n: d["seconds"] for n, d in data.get(baseline, {}).items()}
    fig, ax = plt.subplots(figsize=(max(8, len(sizes) * 0.8), 4.5))
    width = 0.8 / max(len(series_names), 1)
    for si, name in enumerate(series_names):
        xs, ys, lo, hi = [], [], [], []
        for xi, n in enumerate(sizes):
            entry = data[name].get(n)
            if entry is None:
                continue
            t = entry["seconds"]
            norm = base.get(n)
            y = (norm / t) if norm else 1.0 / t
            xs.append(xi + si * width)
            ys.append(y)
            # dispersion whiskers from the recorded repetitions (the
            # criterion-IQR analog, reference benchmark_plots.py):
            # min/max of the per-rep estimates, normalized like y
            reps = entry.get("samples") or []
            if len(reps) >= 2 and norm:
                lo.append(y - norm / max(reps))
                hi.append(norm / min(reps) - y)
            else:
                lo.append(0.0)
                hi.append(0.0)
        color = SERIES_COLORS.get(name, SERIES_COLORS["Other"])
        bars = ax.bar(
            xs, ys, width=width * 0.92, color=color, label=name, zorder=3
        )
        if any(v > 0 for v in lo + hi):
            ax.errorbar(
                [b.get_x() + b.get_width() / 2 for b in bars], ys,
                yerr=[[max(v, 0) for v in lo], [max(v, 0) for v in hi]],
                fmt="none", ecolor=TEXT, elinewidth=0.7, capsize=1.5,
                zorder=4,
            )
        for b, y in zip(bars, ys):
            ax.text(
                b.get_x() + b.get_width() / 2,
                y,
                f"{y:.1f}",
                ha="center",
                va="bottom",
                fontsize=6,
                color=TEXT,
            )
    ax.axhline(1.0, color=MUTED, lw=1, ls="--", zorder=2)
    ax.set_xticks(
        [i + width * (len(series_names) - 1) / 2 for i in range(len(sizes))]
    )
    ax.set_xticklabels(
        [f"2^{n.bit_length()-1}" for n in sizes], fontsize=7, color=TEXT
    )
    ax.set_ylabel(f"speedup vs {baseline} (median)", color=TEXT)
    ax.set_title(group, color=TEXT)
    ax.grid(axis="y", color="#e6e6e6", lw=0.6, zorder=0)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    ax.legend(frameon=False, fontsize=8)
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{group}.png")
    fig.tight_layout()
    fig.savefig(out, dpi=160)
    plt.close(fig)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(common.OUT_DIR, "plots"))
    ap.add_argument(
        "--baseline",
        default=None,
        help="normalization series (default: Numpy for library groups, "
        "the group's own registry baseline otherwise)",
    )
    args = ap.parse_args()
    wrote = []
    for group, registry_baseline in common.GROUPS.items():
        data = load_group(group)
        if len(data) == 0:
            continue
        baseline = args.baseline or (
            "Numpy" if "Numpy" in data else registry_baseline
        )
        wrote.append(plot_group(group, data, args.out, baseline))
    if not wrote:
        print("no samples found — run the bench_* runners first")
    for w in wrote:
        print("wrote", w)


if __name__ == "__main__":
    main()
