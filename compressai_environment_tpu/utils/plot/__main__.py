"""Plot rate-distortion curves from result JSON files
(reference ``utils/plot/__main__.py``).

Usage:
    python -m compressai_environment_tpu.utils.plot -f results/*.json -m psnr
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from pathlib import Path

_backends = ["matplotlib", "plotly"]


def parse_json_file(filepath, metric):
    filepath = Path(filepath)
    name = filepath.name.split(".")[0]
    with filepath.open("r") as f:
        try:
            data = json.load(f)
        except json.decoder.JSONDecodeError as err:
            print(f'Error reading file "{filepath}"')
            raise err

    if "results" in data:
        results = data["results"]
    else:
        results = data

    if metric not in results:
        raise ValueError(
            f'Error: metric "{metric}" not available.'
            f' Available metrics: {", ".join(results.keys())}'
        )

    try:
        if metric == "ms-ssim":
            # reference converts to dB scale: -10 log10(1 - ms-ssim)
            values = [-10 * math.log10(1 - v) for v in results[metric]]
        else:
            values = results[metric]
        return {
            "name": data.get("name", name),
            "xs": results["bpp"],
            "ys": values,
        }
    except KeyError:
        raise ValueError(f'Invalid file "{filepath}"')


def matplotlib_plt(scatters, title, ylabel, output_file, limits=None, show=False,
                   figsize=None):
    import matplotlib.pyplot as plt

    if figsize is None:
        figsize = (9, 6)
    fig, ax = plt.subplots(figsize=figsize)
    for sc in scatters:
        linestyle = "-"
        if any(c in sc["name"].lower() for c in ("jpeg", "webp", "bpg", "vtm", "hm", "av1")):
            linestyle = "--"  # dashed for classical codecs
        ax.plot(sc["xs"], sc["ys"], marker=".", linestyle=linestyle, label=sc["name"])

    ax.set_xlabel("Bit-rate [bpp]")
    ax.set_ylabel(ylabel)
    ax.grid()
    if limits is not None:
        ax.axis(limits)
    ax.legend(loc="lower right")
    if title:
        ax.title.set_text(title)
    if show:
        plt.show()
    if output_file:
        fig.savefig(output_file, dpi=300)


def plotly_plt(scatters, title, ylabel, output_file, limits=None, show=False,
               figsize=None):
    import plotly.graph_objs as go

    fig = go.Figure()
    for sc in scatters:
        fig.add_trace(go.Scatter(x=sc["xs"], y=sc["ys"], name=sc["name"]))
    fig.update_layout(title=title, xaxis_title="Bit-rate [bpp]", yaxis_title=ylabel)
    if output_file:
        fig.write_html(str(Path(output_file).with_suffix(".html")))
    if show:
        fig.show()


def setup_args():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "-f", "--results-file", metavar="", default="", type=str, nargs="*",
        required=True,
    )
    parser.add_argument(
        "-m", "--metric", metavar="", type=str, default="psnr",
        help="Metric (default: %(default)s)",
    )
    parser.add_argument("-t", "--title", metavar="", type=str, help="Plot title")
    parser.add_argument("-o", "--output", metavar="", type=str, help="Output file")
    parser.add_argument(
        "--figsize", metavar="", type=float, nargs=2, default=(9, 6)
    )
    parser.add_argument(
        "--axes", metavar="", type=float, nargs=4, default=None,
        help="Axes limit (xmin, xmax, ymin, ymax)",
    )
    parser.add_argument(
        "--backend", type=str, metavar="", default=_backends[0], choices=_backends
    )
    parser.add_argument("--show", action="store_true", help="Open plot figure")
    return parser


def main(argv):
    args = setup_args().parse_args(argv)

    scatters = []
    for f in args.results_file:
        rv = parse_json_file(f, args.metric)
        scatters.append(rv)

    ylabel = f"{args.metric} [dB]"
    func_map = {"matplotlib": matplotlib_plt, "plotly": plotly_plt}
    func_map[args.backend](
        scatters, args.title, ylabel, args.output,
        limits=args.axes, figsize=args.figsize, show=args.show,
    )


if __name__ == "__main__":
    main(sys.argv[1:])
