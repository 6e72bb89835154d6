"""Collect classical-codec rate-distortion metrics over an image dataset
(reference ``utils/bench/__main__.py``).

Usage:
    python -m compressai_environment_tpu.utils.bench jpeg <dataset> -q 10 50 90
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import sys
from collections import defaultdict
from itertools import starmap
from pathlib import Path

from .codecs import AV1, BPG, HM, JPEG, JPEG2000, TFCI, VTM, Codec, WebP

codecs = [JPEG, WebP, JPEG2000, BPG, TFCI, VTM, HM, AV1]


def func(codec, filepath, quality):
    return codec.run(filepath, quality)


def collect(codec: Codec, dataset: str, qualities, num_jobs: int = 1):
    filepaths = sorted(
        p for p in Path(dataset).iterdir()
        if p.suffix.lower() in (".jpg", ".jpeg", ".png", ".ppm", ".bmp")
    )
    if not filepaths:
        raise RuntimeError(f"No images found in {dataset}")

    args = [
        (codec, str(f), q) for q in qualities for f in filepaths
    ]
    if num_jobs > 1:
        with mp.Pool(num_jobs) as pool:
            rv = pool.starmap(func, args)
    else:
        rv = list(starmap(func, args))

    results = [defaultdict(float) for _ in qualities]
    n_per_q = len(filepaths)
    for i, metrics in enumerate(rv):
        qi = i // n_per_q
        for k, v in metrics.items():
            results[qi][k] += v

    out = defaultdict(list)
    for r in results:
        for k, v in r.items():
            out[k].append(v / n_per_q)
    return out


def setup_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    subparsers = parser.add_subparsers(dest="codec", required=True)
    for c in codecs:
        cparser = subparsers.add_parser(
            c.__name__.lower(), help=f"{c.__name__} benchmark"
        )
        cparser.add_argument("dataset", type=str)
        cparser.add_argument(
            "-q", "--qualities", nargs="+", type=int, default=(75,)
        )
        cparser.add_argument("-j", "--num-jobs", type=int, default=1)
        c().add_parser_args(cparser)
    return parser


def main(argv):
    args = setup_parser().parse_args(argv)
    codec_cls = next(c for c in codecs if c.__name__.lower() == args.codec)
    codec = codec_cls()
    if hasattr(codec, "set_args"):
        codec.set_args(args)
    results = collect(codec, args.dataset, sorted(args.qualities), args.num_jobs)
    output = {
        "name": codec.name,
        "description": codec.description,
        "results": results,
    }
    print(json.dumps(output, indent=2))


if __name__ == "__main__":
    main(sys.argv[1:])
