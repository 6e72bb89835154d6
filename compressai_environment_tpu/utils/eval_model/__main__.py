"""Evaluate a codec on an image dataset: real coding or entropy estimation.

CLI-compatible re-implementation of reference
``compressai/utils/eval_model/__main__.py``: same subcommands
(``pretrained`` / ``checkpoint``), same metrics, and the same JSON report
schema ``{"name", "description", "results": {psnr, ms-ssim, bpp,
encoding_time, decoding_time}}`` consumed by the plot tool.

Usage:
    python -m compressai_environment_tpu.utils.eval_model checkpoint <dataset>
        -a bmshj2018-factorized -p ckpt.pth.tar [--entropy-estimation]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

IMG_EXTENSIONS = {".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif", ".tiff", ".webp"}


def collect_images(rootpath: str):
    return sorted(
        p for p in Path(rootpath).iterdir() if p.suffix.lower() in IMG_EXTENSIONS
    )


def pad(x: np.ndarray, p: int = 64):
    """Center-pad (B, H, W, C) to multiples of p
    (reference ``eval_model:96-109``)."""
    h, w = x.shape[1:3]
    new_h = (h + p - 1) // p * p
    new_w = (w + p - 1) // p * p
    pl = (new_w - w) // 2
    pr = new_w - w - pl
    pt = (new_h - h) // 2
    pb = new_h - h - pt
    return (
        np.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0))),
        (pt, pb, pl, pr),
    )


def crop(x: np.ndarray, padding):
    pt, pb, pl, pr = padding
    h, w = x.shape[1:3]
    return x[:, pt : h - pb or None, pl : w - pr or None, :]


def inference(model, x: np.ndarray):
    """Real encode/decode with wall-clock timing
    (reference ``eval_model:92-132``)."""
    from ...utils.metrics import ms_ssim, psnr

    x_padded, padding = pad(x, 64)

    start = time.time()
    out_enc = model.compress(x_padded)
    enc_time = time.time() - start

    start = time.time()
    out_dec = model.decompress(out_enc["strings"], out_enc["shape"])
    dec_time = time.time() - start

    x_hat = crop(np.asarray(out_dec["x_hat"]), padding)

    num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
    bpp = sum(
        sum(len(s) for s in strings) for strings in out_enc["strings"]
    ) * 8.0 / num_pixels

    return {
        "psnr": psnr(np.round(x * 255), np.round(np.clip(x_hat, 0, 1) * 255), 255.0),
        "ms-ssim": ms_ssim(x, x_hat),
        "bpp": bpp,
        "encoding_time": enc_time,
        "decoding_time": dec_time,
    }


def inference_entropy_estimation(model, x: np.ndarray):
    """bpp from likelihoods without real coding
    (reference ``eval_model:135-154``)."""
    from ...utils.metrics import ms_ssim, psnr

    x_padded, padding = pad(x, 64)

    start = time.time()
    out = model.forward(x_padded, training=False)
    elapsed = time.time() - start

    x_hat = crop(np.asarray(out["x_hat"]), padding)
    num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
    bpp = float(
        sum(
            np.sum(-np.log2(np.asarray(lik)))
            for lik in out["likelihoods"].values()
        )
        / num_pixels
    )
    return {
        "psnr": psnr(np.round(x * 255), np.round(np.clip(x_hat, 0, 1) * 255), 255.0),
        "ms-ssim": ms_ssim(x, np.clip(x_hat, 0, 1)),
        "bpp": bpp,
        "encoding_time": elapsed / 2,
        "decoding_time": elapsed / 2,
    }


_METRIC_KEYS = ("psnr", "ms-ssim", "bpp", "encoding_time", "decoding_time")


def eval_model(model, filepaths, entropy_estimation=False,
               global_indices=None, total=None, **kwargs):
    """Per-image inference, averaged over the dataset. In a distributed run
    ``filepaths`` is this process's shard; per-image records are
    all-gathered into global order before averaging, so every process
    returns identical dataset-level metrics."""
    from ...datasets.image import load_image

    rows = []
    for filepath in filepaths:
        x = load_image(filepath)[None]
        if entropy_estimation:
            rv = inference_entropy_estimation(model, x)
        else:
            rv = inference(model, x)
        rows.append([float(rv[k]) for k in _METRIC_KEYS])
    rec = np.asarray(rows, np.float64)
    if total is not None:
        from ...parallel.distributed import allgather_records

        rec = allgather_records(rec, global_indices, total)
    return {k: float(rec[:, i].mean()) for i, k in enumerate(_METRIC_KEYS)}


def setup_args():
    parent = argparse.ArgumentParser(add_help=False)
    parent.add_argument("dataset", type=str, help="dataset path")
    parent.add_argument(
        "-a", "--architecture", type=str, required=True,
        help="model architecture",
    )
    parent.add_argument(
        "-c", "--entropy-coder", type=str, default="ans",
        help="entropy coder (default: %(default)s)",
    )
    parent.add_argument("--entropy-estimation", action="store_true",
                        help="use evaluated entropy estimation (no coding)")
    parent.add_argument(
        "--half", action="store_true",
        help="run transforms in half precision (bfloat16; the reference's "
             "--half is fp16 — eval_model/__main__.py:174-176)",
    )
    parent.add_argument("-v", "--verbose", action="store_true")
    from ...parallel.distributed import add_distributed_args

    add_distributed_args(parent)

    parser = argparse.ArgumentParser(
        description="Evaluate a model on an image dataset.", add_help=True
    )
    subparsers = parser.add_subparsers(dest="source", required=True)

    pretrained = subparsers.add_parser("pretrained", parents=[parent])
    pretrained.add_argument(
        "-m", "--metric", type=str, choices=["mse", "ms-ssim"], default="mse"
    )
    pretrained.add_argument("-q", "--quality", dest="qualities", nargs="+",
                            type=int, default=(1,))

    ckpt = subparsers.add_parser("checkpoint", parents=[parent])
    ckpt.add_argument("-p", "--path", dest="paths", type=str, nargs="*",
                      required=True, help="checkpoint path(s)")
    return parser


def main(argv):
    args = setup_args().parse_args(argv)

    # join the cluster before any other jax use (backend clients must be
    # created after jax.distributed.initialize)
    from ...parallel.distributed import maybe_initialize, shard_work

    pidx, pcount = maybe_initialize(args)

    from ...zoo import image_models, model_architectures
    from ...zoo.image import _load_model

    filepaths = collect_images(args.dataset)
    if len(filepaths) == 0:
        print("Error: no images found in directory.", file=sys.stderr)
        sys.exit(1)
    n_total = len(filepaths)
    local_paths, global_indices = shard_work(filepaths, pidx, pcount)

    import compressai_environment_tpu

    compressai_environment_tpu.set_entropy_coder(args.entropy_coder)

    if args.source == "pretrained":
        runs = sorted(args.qualities)
        opts = (args.architecture, args.metric)
        load_func = lambda q: image_models[args.architecture](
            q, metric=args.metric, pretrained=True
        )
        log_fmt = "\rEvaluating {0} | {run:d}"
    else:
        runs = args.paths
        opts = (args.architecture,)
        load_func = lambda p: _load_model(
            args.architecture, "mse", 1, checkpoint_path=p
        )
        log_fmt = "\rEvaluating {run:s}"

    results = defaultdict(list)
    for run in runs:
        if args.verbose:
            sys.stderr.write(log_fmt.format(*opts, run=run))
            sys.stderr.flush()
        model = load_func(run)
        model.stream_format = compressai_environment_tpu.coder_stream_formats[
            args.entropy_coder
        ]
        if not args.entropy_estimation:
            model.update()
            # half() only applies to the real-coding inference path, matching
            # the reference (utils/eval_model/__main__.py:173-176) where the
            # fp16 cast lives inside the non-estimation branch; entropy
            # estimation stays fp32.
            if args.half:
                model.half()
        metrics = eval_model(
            model, local_paths, args.entropy_estimation,
            global_indices=global_indices,
            total=n_total if pcount > 1 else None,
        )
        for k, v in metrics.items():
            results[k].append(v)

    if args.verbose:
        sys.stderr.write("\n")

    description = (
        "entropy estimation" if args.entropy_estimation else args.entropy_coder
    )
    output = {
        "name": args.architecture,
        "description": f"Inference ({description})",
        "results": results,
    }
    if pidx == 0:  # all processes hold identical gathered results
        print(json.dumps(output, indent=2))


if __name__ == "__main__":
    main(sys.argv[1:])
