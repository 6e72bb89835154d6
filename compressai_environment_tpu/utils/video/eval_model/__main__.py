"""Evaluate a video codec (ssf2020) on raw YUV sequences
(reference ``compressai/utils/video/eval_model/__main__.py``).

Per sequence: YUV420 frames -> RGB (bicubic 420->444 + BT.709), pad to x128,
keyframe/inter encode through a real bitstream container, then per-frame
PSNR (y/u/v/yuv/rgb) and MS-SSIM. Results aggregate into the reference JSON
schema; per-sequence JSONs are cached. ``--entropy-estimation`` skips coding.

Usage:
    python -m compressai_environment_tpu.utils.video.eval_model checkpoint \
        <dataset-dir-with-yuv> -a ssf2020 -p ckpt.msgpack
"""

from __future__ import annotations

import argparse
import json
import math
import struct
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np


def collect_videos(rootpath: str):
    return sorted(Path(rootpath).glob("*.yuv"))


def to_rgb_frame(frame, max_val: int) -> np.ndarray:
    """YUV420 planar frame -> (1, H, W, 3) float RGB in [0, 1]
    (reference ``convert_yuv420_rgb``)."""
    from ....transforms import ycbcr2rgb, yuv_420_to_444

    y = np.asarray(frame["y"], np.float32) / max_val
    u = np.asarray(frame["u"], np.float32) / max_val
    v = np.asarray(frame["v"], np.float32) / max_val
    yuv = yuv_420_to_444((y[None], u[None], v[None]), mode="bicubic")
    return ycbcr2rgb(yuv.astype(np.float32))


def to_yuv420(rgb: np.ndarray):
    """(1, H, W, 3) RGB -> 420 planes (reference ``convert_rgb_yuv420``)."""
    from ....transforms import rgb2ycbcr, yuv_444_to_420

    return yuv_444_to_420(rgb2ycbcr(rgb))


def pad(x: np.ndarray, p: int = 2**7):
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


def compute_metrics_for_frame(org_frame, rec_rgb: np.ndarray, bitdepth: int = 8):
    """psnr-y/u/v, psnr-yuv = (4y+u+v)/6, rgb psnr + ms-ssim
    (reference ``eval_model:141-173``)."""
    from ....utils.metrics import ms_ssim, psnr

    max_val = 2**bitdepth - 1
    org_rgb = to_rgb_frame(org_frame, max_val)

    metrics = {}
    # YUV domain: convert both to 420 and compare planes
    org_planes = {
        "y": np.asarray(org_frame["y"], np.float32) / max_val,
        "u": np.asarray(org_frame["u"], np.float32) / max_val,
        "v": np.asarray(org_frame["v"], np.float32) / max_val,
    }
    rec_y, rec_u, rec_v = to_yuv420(np.clip(rec_rgb, 0, 1))
    rec_planes = {"y": rec_y[0], "u": rec_u[0], "v": rec_v[0]}
    for c in ("y", "u", "v"):
        metrics[f"psnr-{c}"] = psnr(org_planes[c], rec_planes[c], 1.0)
    metrics["psnr-yuv"] = (
        4 * metrics["psnr-y"] + metrics["psnr-u"] + metrics["psnr-v"]
    ) / 6
    metrics["psnr-rgb"] = psnr(org_rgb, np.clip(rec_rgb, 0, 1), 1.0)
    metrics["ms-ssim-rgb"] = ms_ssim(org_rgb, np.clip(rec_rgb, 0, 1))
    return metrics


# -- bitstream container (reference eval_model:191-240) ----------------------


def write_uints(fd, values):
    fd.write(struct.pack(f">{len(values)}I", *values))


def read_uints(fd, n):
    return struct.unpack(f">{n}I", fd.read(4 * n))


def write_frame_strings(fd, strings_dict):
    """Serialize one frame's {label: [strings...]} (or a flat list)."""
    if isinstance(strings_dict, dict):
        items = sorted(strings_dict.items())
        write_uints(fd, (1, len(items)))
        for label, strings in items:
            lab = label.encode()
            write_uints(fd, (len(lab),))
            fd.write(lab)
            _write_string_list(fd, strings)
    else:
        write_uints(fd, (0, 0))
        _write_string_list(fd, strings_dict)


def _write_string_list(fd, strings):
    write_uints(fd, (len(strings),))
    for group in strings:
        for s in group if isinstance(group, list) else [group]:
            write_uints(fd, (len(s),))
            fd.write(s)


def read_frame_strings(fd, shapes):
    is_dict, n_items = read_uints(fd, 2)
    if is_dict:
        out = {}
        for _ in range(n_items):
            (lab_len,) = read_uints(fd, 1)
            label = fd.read(lab_len).decode()
            out[label] = _read_string_list(fd)
        return out
    return _read_string_list(fd)


def _read_string_list(fd):
    (n,) = read_uints(fd, 1)
    out = []
    for _ in range(n):
        (ln,) = read_uints(fd, 1)
        out.append([fd.read(ln)])
    return out


def eval_sequence(model, seq_path: Path, max_frames: int = None,
                  entropy_estimation: bool = False, keep_bitstream=None):
    from ....datasets.rawvideo import RawVideoSequence, VideoFormat

    org_seq = RawVideoSequence.from_file(str(seq_path))
    if org_seq.format != VideoFormat.YUV420:
        raise NotImplementedError(f"Unsupported video format: {org_seq.format}")
    bitdepth = org_seq.bitdepth
    max_val = 2**bitdepth - 1

    num_frames = org_seq.total_frms if max_frames is None else min(
        org_seq.total_frms, max_frames
    )
    frames = [
        pad(to_rgb_frame(org_seq[i], max_val))[0] for i in range(num_frames)
    ]
    padding = pad(to_rgb_frame(org_seq[0], max_val))[1]

    results = defaultdict(list)
    if entropy_estimation:
        start = time.time()
        out = model.forward(frames, training=False)
        elapsed = time.time() - start
        num_pixels = org_seq.width * org_seq.height
        total_bpp = 0.0
        for frame_liks in out["likelihoods"]:
            for label_liks in frame_liks.values():
                for lik in label_liks.values():
                    total_bpp += float(np.sum(-np.log2(np.asarray(lik))))
        total_bpp /= num_pixels * num_frames
        rec_frames = [np.asarray(f) for f in out["x_hat"]]
        enc_time = dec_time = elapsed / 2
        size_bits = None
    else:
        start = time.time()
        strings, shapes = model.compress(frames)
        enc_time = time.time() - start

        size_bits = 0
        for fs in strings:
            if isinstance(fs, dict):
                for strs in fs.values():
                    size_bits += sum(len(s[0]) for s in strs) * 8
            else:
                size_bits += sum(len(s[0]) for s in fs) * 8

        start = time.time()
        rec_frames = [np.asarray(f) for f in model.decompress(strings, shapes)]
        dec_time = time.time() - start
        total_bpp = size_bits / (org_seq.width * org_seq.height * num_frames)

    for i in range(num_frames):
        rec = crop(rec_frames[i], padding)
        m = compute_metrics_for_frame(org_seq[i], rec, bitdepth)
        for k, v in m.items():
            results[k].append(v)

    seq_results = {k: float(np.mean(v)) for k, v in results.items()}
    seq_results["bpp"] = float(total_bpp)
    if org_seq.framerate and size_bits is not None:
        seq_results["bitrate"] = float(
            size_bits * float(org_seq.framerate) / (num_frames * 1000)
        )
    seq_results["encoding_time"] = enc_time
    seq_results["decoding_time"] = dec_time
    org_seq.close()
    return seq_results


def setup_args():
    parent = argparse.ArgumentParser(add_help=False)
    parent.add_argument("dataset", type=str)
    parent.add_argument("-a", "--architecture", type=str, default="ssf2020",
                        choices=["ssf2020"])
    parent.add_argument("--entropy-estimation", action="store_true")
    parent.add_argument("--max-frames", type=int, default=None)
    parent.add_argument("--output-dir", type=str, default=None,
                        help="cache per-sequence JSON results here")
    parent.add_argument("-v", "--verbose", action="store_true")

    parser = argparse.ArgumentParser(description="Video codec evaluation.")
    sub = parser.add_subparsers(dest="source", required=True)
    pre = sub.add_parser("pretrained", parents=[parent])
    pre.add_argument("-m", "--metric", default="mse", choices=["mse", "ms-ssim"])
    pre.add_argument("-q", "--quality", dest="qualities", nargs="+", type=int,
                     default=(1,))
    ckpt = sub.add_parser("checkpoint", parents=[parent])
    ckpt.add_argument("-p", "--path", dest="paths", type=str, nargs="+",
                      required=True)
    return parser


def main(argv):
    args = setup_args().parse_args(argv)

    from ....zoo import ssf2020

    seqs = collect_videos(args.dataset)
    if not seqs:
        print("Error: no YUV sequences found.", file=sys.stderr)
        sys.exit(1)

    if args.source == "pretrained":
        runs = sorted(args.qualities)
        load = lambda q: ssf2020(q, metric=args.metric, pretrained=True)
    else:
        runs = args.paths
        load = lambda p: ssf2020(1, checkpoint_path=p)

    results = defaultdict(list)
    for run in runs:
        model = load(run)
        if not args.entropy_estimation:
            model.update()
        per_seq = defaultdict(list)
        for seq in seqs:
            cache = None
            if args.output_dir:
                cache = Path(args.output_dir) / f"{seq.stem}-{run}.json"
                if cache.is_file():
                    rv = json.loads(cache.read_text())
                    for k, v in rv.items():
                        per_seq[k].append(v)
                    continue
            if args.verbose:
                sys.stderr.write(f"\revaluating {seq.name}")
            rv = eval_sequence(
                model, seq, args.max_frames, args.entropy_estimation
            )
            if cache:
                cache.parent.mkdir(parents=True, exist_ok=True)
                cache.write_text(json.dumps(rv))
            for k, v in rv.items():
                per_seq[k].append(v)
        for k, v in per_seq.items():
            results[k].append(float(np.mean(v)))

    output = {
        "name": args.architecture,
        "description": "entropy-estimation" if args.entropy_estimation else "ans",
        "results": results,
    }
    print(json.dumps(output, indent=2))


if __name__ == "__main__":
    main(sys.argv[1:])
