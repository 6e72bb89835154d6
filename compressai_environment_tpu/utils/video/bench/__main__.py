"""Benchmark classical video codecs over YUV sequences
(reference ``utils/video/bench/__main__.py``).

Usage:
    python -m compressai_environment_tpu.utils.video.bench x264 <dataset> -q 27 32 37
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import sys
from collections import defaultdict
from itertools import starmap
from pathlib import Path

import numpy as np

from .codecs import HM, VTM, Codec, x264, x265

codecs = [x264, x265, VTM, HM]


def run_one(codec, video, qp):
    return codec.run(video, qp)


def collect(codec: Codec, dataset: str, qps, num_jobs: int = 1):
    videos = sorted(Path(dataset).glob("*.yuv"))
    if not videos:
        raise RuntimeError(f"No YUV sequences found in {dataset}")

    args = [(codec, str(v), qp) for qp in qps for v in videos]
    if num_jobs > 1:
        with mp.Pool(num_jobs) as pool:
            rv = pool.starmap(run_one, args)
    else:
        rv = list(starmap(run_one, args))

    results = defaultdict(list)
    n_per_qp = len(videos)
    for qi in range(len(qps)):
        chunk = rv[qi * n_per_qp : (qi + 1) * n_per_qp]
        for k in chunk[0]:
            results[k].append(float(np.mean([c[k] for c in chunk])))
    return results


def setup_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="codec", required=True)
    for c in codecs:
        p = sub.add_parser(c.__name__.lower())
        p.add_argument("dataset", type=str)
        p.add_argument("-q", "--qps", nargs="+", type=int, default=(32,))
        p.add_argument("-j", "--num-jobs", type=int, default=1)
        p.add_argument("-b", "--binpath", type=str, default=None)
        p.add_argument("-c", "--config", type=str, default=None,
                       help="encoder config file (VTM/HM)")
    return parser


def main(argv):
    args = setup_parser().parse_args(argv)
    cls = next(c for c in codecs if c.__name__.lower() == args.codec)
    kwargs = {}
    if args.binpath:
        kwargs["binpath"] = args.binpath
    if args.config:
        kwargs["config"] = args.config
    codec = cls(**kwargs)
    results = collect(codec, args.dataset, sorted(args.qps), args.num_jobs)
    print(json.dumps(
        {"name": codec.name, "description": codec.description, "results": results},
        indent=2,
    ))


if __name__ == "__main__":
    main(sys.argv[1:])
