"""Binary-search a classical codec's quality parameter to hit a target
bpp/PSNR/MS-SSIM (reference ``utils/find_close/__main__.py``).

Usage:
    python -m compressai_environment_tpu.utils.find_close jpeg img.png 0.5 --metric bpp
"""

from __future__ import annotations

import argparse
import sys

from ..bench.codecs import AV1, BPG, HM, JPEG, JPEG2000, TFCI, VTM, Codec, WebP

codecs = [JPEG, WebP, JPEG2000, BPG, TFCI, VTM, HM, AV1]


def get_codec_q_bounds(codec: Codec):
    """Per-codec quality bounds and search direction
    (reference ``find_close:49-64``)."""
    rev = False  # higher q -> better quality
    if isinstance(codec, BPG):
        lower, upper = 0, 51
        rev = True
    elif isinstance(codec, JPEG2000):
        lower, upper = 1, 1000
        rev = True
    elif isinstance(codec, HM):
        lower, upper = 0, 51
        rev = True
    elif isinstance(codec, (VTM, AV1)):  # QP / cq-level: higher = worse
        lower, upper = 0, 63
        rev = True
    elif isinstance(codec, TFCI):
        lower, upper = 1, 8
    else:
        lower, upper = 0, 100
    return lower, upper, rev


def find_closest(codec: Codec, img: str, target: float, metric: str = "psnr"):
    lower, upper, rev = get_codec_q_bounds(codec)

    best_rv, best_quality = {}, None
    for _ in range(32):  # 32 iterations are more than enough for integer q
        mid = (lower + upper) // 2
        if best_quality == mid:
            break
        rv = codec.run(img, mid)
        is_best = best_quality is None or abs(rv[metric] - target) < abs(
            best_rv[metric] - target
        )
        if is_best:
            best_rv, best_quality = rv, mid
        if rv[metric] > target:
            if not rev:
                upper = mid - 1
            else:
                lower = mid + 1
        else:
            if not rev:
                lower = mid + 1
            else:
                upper = mid - 1
        if lower > upper:
            break

    sys.stderr.write(
        f"\nquality {best_quality} | {metric}: {best_rv[metric]:.4f}\n"
    )
    return best_quality, best_rv


def setup_args():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "codec", choices=[c.__name__.lower() for c in codecs]
    )
    parser.add_argument("image", type=str)
    parser.add_argument("target", type=float)
    parser.add_argument(
        "-m", "--metric", choices=["bpp", "psnr", "ms-ssim"], default="bpp"
    )
    return parser


def main(argv):
    # two-pass parse so codec-specific options (e.g. VTM --build-dir) are
    # accepted after the base arguments
    base, rest = setup_args().parse_known_args(argv)
    codec_cls = next(c for c in codecs if c.__name__.lower() == base.codec)
    codec = codec_cls()
    extra = argparse.ArgumentParser()
    codec.add_parser_args(extra)
    if hasattr(codec, "set_args"):
        codec.set_args(extra.parse_args(rest))
    elif rest:
        extra.parse_args(rest)  # raise on unknown options
    args = base
    quality, rv = find_closest(codec, args.image, args.target, args.metric)
    import json

    print(json.dumps({"quality": quality, "results": rv}, indent=2))


if __name__ == "__main__":
    main(sys.argv[1:])
