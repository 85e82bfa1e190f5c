"""Plot bench.py results — the TPU counterpart of the reference's
bench/plot-speeds.py (speed vs compression-ratio curves per run, with
the memory-bandwidth baseline as a reference line, plot-speeds.py:62-126).

Usage:
    python bench.py --suite --json-only > blosclz.jsonl
    python bench/plot_speeds.py blosclz.jsonl [more.jsonl ...] -o speeds.png

Each input file holds one-or-more JSON lines as emitted by bench.py; every
line's clevel sweep becomes one compress curve and one decompress curve
(speed in GB/s against the achieved compression ratio, clevel annotated
at each point). The device-read bandwidth (the "memcpy read" analog,
bench.c:227-248) is drawn as a dashed baseline.
"""

from __future__ import annotations

import argparse
import json
import sys

# fixed categorical order (identity follows the metric, never the file
# order): compress = blue, decompress = orange; the baseline is a neutral
# gray reference line, not a series
_COMPRESS = "#2a78d6"
_DECOMPRESS = "#eb6834"
_BASELINE = "#52514e"
_MARKERS = ["o", "s", "v", "^", "x", "+"]


def _load(path: str) -> list[dict]:
    runs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or not line.startswith("{"):
                continue
            try:
                runs.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return runs


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("files", nargs="+", help="bench.py JSON-line files")
    ap.add_argument("-o", "--out", default="speeds.png")
    ap.add_argument("--title", default="")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5), facecolor="white")
    baseline = None
    for fi, path in enumerate(args.files):
        for run in _load(path):
            det = run.get("details", {})
            sweep = det.get("clevel_sweep")
            if not sweep:       # single-point run: synthesize one entry
                sweep = {str(det.get("config", {}).get("clevel", "?")): {
                    "compress_gbps": run.get("value"),
                    "decompress_gbps": det.get("decompress_gbps"),
                    "ratio": det.get("ratio"),
                }}
            name = run.get("metric", path).replace("_compress_device", "")
            mk = _MARKERS[fi % len(_MARKERS)]
            pts = sorted(
                ((v["ratio"], v["compress_gbps"], v["decompress_gbps"],
                  int(k))
                 for k, v in sweep.items()
                 if str(k).isdigit() and v.get("ratio")
                 and v.get("compress_gbps") is not None
                 and v.get("decompress_gbps") is not None),
                key=lambda t: t[3])
            if not pts:
                continue
            r, cw, cr, lv = zip(*pts)
            ax.plot(r, cw, color=_COMPRESS, lw=2, marker=mk, ms=6,
                    label=f"{name} compress")
            ax.plot(r, cr, color=_DECOMPRESS, lw=2, marker=mk, ms=6,
                    label=f"{name} decompress")
            for x, y, L in zip(r, cw, lv):
                ax.annotate(str(L), (x, y), textcoords="offset points",
                            xytext=(0, 6), fontsize=7, color="#52514e",
                            ha="center")
            b = det.get("device_read_gbps")
            baseline = max(baseline or 0, b) if b else baseline

    if baseline:
        ax.axhline(baseline, color=_BASELINE, lw=1, ls="--")
        ax.annotate(f"device read {baseline:.0f} GB/s",
                    (ax.get_xlim()[1], baseline), fontsize=8,
                    color=_BASELINE, ha="right", va="bottom")
        ax.set_yscale("log")

    ax.set_xlabel("compression ratio")
    ax.set_ylabel("throughput (GB/s)")
    if args.title:
        ax.set_title(args.title, fontsize=11)
    ax.grid(True, color="#e7e6e1", lw=0.5)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    ax.legend(fontsize=8, frameon=False)
    fig.tight_layout()
    fig.savefig(args.out, dpi=144)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
