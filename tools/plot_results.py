#!/usr/bin/env python3
"""Plot benchmark CSVs: throughput vs N, keys / key-value panels.

Analog of the reference's tools/plot.py (merge multiple CSVs, two-panel
GPU-solid / CPU-dashed comparison, power-of-two N annotations, device name,
`# version:` CSV metadata). Colors are a fixed-order validated categorical
palette (adjacent-pair CVD deltaE >= 8, see the dataviz palette reference);
each backend keeps its slot regardless of which files are passed.

Usage: python tools/plot_results.py results1.csv [results2.csv ...]
           [--output results.png]
"""

import argparse
import csv
import sys
from collections import defaultdict

# fixed categorical slots (validated palette, light mode); color follows the
# backend identity, never file order
BACKEND_COLORS = {
    "network": "#2a78d6",
    "radix": "#eb6834",
    "xla": "#1baf7a",
    "cpp": "#eda100",
    "cpu": "#e87ba4",
}
FALLBACK = ["#008300", "#4a3aa7", "#e34948"]


def read_csv(path):
    version = None
    rows = []
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                if "version:" in line:
                    version = line.split("version:")[1].strip()
                continue
            f2 = [line] + list(f)
            reader = csv.DictReader(f2)
            for r in reader:
                rows.append(r)
            break
    return version, rows


def device_name():
    try:
        import jax

        d = jax.devices()[0]
        return getattr(d, "device_kind", str(d))
    except Exception:
        return "unknown device"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("csvs", nargs="+")
    p.add_argument("--output", "-o", default="results.png")
    p.add_argument("--title", default=None)
    args = p.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # merge: (backend, sort) -> [(n, gpu, cpu)]
    series = defaultdict(list)
    versions = set()
    for path in args.csvs:
        version, rows = read_csv(path)
        if version:
            versions.add(version)
        for r in rows:
            series[(r["backend"], r["sort"])].append(
                (int(r["n"]), float(r["gpu_gitems_s"]), float(r["cpu_gitems_s"]))
            )

    backends = sorted({b for b, _ in series})
    fb = iter(FALLBACK)
    colors = {
        b: BACKEND_COLORS.get(b) or next(fb, "#666666") for b in backends
    }

    fig, axes = plt.subplots(1, 2, figsize=(13, 5), sharey=True)
    panels = [("keys", "32-bit keys"), ("kv", "32-bit key-value")]
    for ax, (sort, label) in zip(axes, panels):
        for b in backends:
            pts = sorted(series.get((b, sort), []))
            if pts:
                ax.plot(
                    [x[0] for x in pts], [x[1] for x in pts], "-",
                    color=colors[b], linewidth=2, label=b,
                )
            if sort == "kv":
                # stable=False extension series, dashed in the kv panel
                # (independent of whether a stable kv series exists)
                ns_pts = sorted(series.get((b, "kvns"), []))
                if ns_pts:
                    ax.plot(
                        [x[0] for x in ns_pts], [x[1] for x in ns_pts],
                        "--", color=colors[b], linewidth=1.6,
                        label=f"{b} (stable=False)",
                    )
        ax.set_xscale("log", base=2)
        ax.set_xlabel("n")
        ax.set_title(label, fontsize=11)
        ax.grid(True, alpha=0.25, linewidth=0.5)
        for spine in ("top", "right"):
            ax.spines[spine].set_visible(False)
        # annotate power-of-two N (reference plot.py behavior)
        all_ns = sorted({x[0] for b in backends for x in series.get((b, sort), [])})
        pow2 = [n for n in all_ns if n & (n - 1) == 0]
        ax.set_xticks(pow2)
        ax.set_xticklabels([f"2^{n.bit_length() - 1}" for n in pow2], fontsize=8)
    axes[0].set_ylabel("throughput (GItems/s)")
    # each panel legends its own series (the kv panel may carry dashed
    # stable=False lines that the keys panel doesn't have)
    for ax in axes:
        if ax.get_legend_handles_labels()[0]:
            ax.legend(frameon=False, fontsize=9)
    title = args.title or f"sort throughput — {device_name()}"
    if versions:
        title += f"  (v{', v'.join(sorted(versions))})"
    fig.suptitle(title, fontsize=12)
    fig.tight_layout()
    fig.savefig(args.output, dpi=150)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
