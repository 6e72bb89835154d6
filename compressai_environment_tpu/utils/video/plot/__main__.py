"""Plot video RD curves (kbps vs psnr-yuv etc.) from result JSONs
(reference ``utils/video/plot/__main__.py``).

Usage:
    python -m compressai_environment_tpu.utils.video.plot -f results/*.json -m psnr-yuv
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from pathlib import Path


def parse_json_file(filepath, metric, rate="bitrate"):
    filepath = Path(filepath)
    with filepath.open("r") as f:
        data = json.load(f)
    results = data.get("results", data)
    if metric not in results:
        raise ValueError(
            f'Metric "{metric}" not available; have: {", ".join(results)}'
        )
    ys = results[metric]
    if metric.startswith("ms-ssim"):
        ys = [-10 * math.log10(1 - v) for v in ys]
    xs = results.get(rate) or results.get("bpp")
    return {"name": data.get("name", filepath.stem), "xs": xs, "ys": ys}


def main(argv):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-f", "--results-file", nargs="+", required=True)
    parser.add_argument("-m", "--metric", default="psnr-yuv")
    parser.add_argument("-t", "--title", default=None)
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument("--show", action="store_true")
    args = parser.parse_args(argv)

    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 6))
    for f in args.results_file:
        sc = parse_json_file(f, args.metric)
        style = "--" if any(
            c in sc["name"].lower() for c in ("x264", "x265", "vtm", "hm", "av1")
        ) else "-"
        ax.plot(sc["xs"], sc["ys"], marker=".", linestyle=style, label=sc["name"])
    ax.set_xlabel("Bitrate [kbps]")
    ax.set_ylabel(args.metric)
    ax.grid()
    ax.legend(loc="lower right")
    if args.title:
        ax.title.set_text(args.title)
    if args.show:
        plt.show()
    if args.output:
        fig.savefig(args.output, dpi=300)


if __name__ == "__main__":
    main(sys.argv[1:])
