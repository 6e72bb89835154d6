"""File-format codec CLI: encode images (and video, via ssf2020) to real
bitstream files and decode them back.

Byte-compatible with the reference ``examples/codec.py`` container format:

* header: 1 byte model id, 1 byte ``metric<<4 | (quality-1)``
  (+ 4-byte frame count for video) — reference ``codec.py:147-177``,
* image body: 4+4 bytes original (h, w), 1 byte bitdepth, then
  ``write_body``: latent shape (2 uints), number of string groups,
  length-prefixed strings — reference ``codec.py:180-197``.

Usage:
    python examples/codec.py encode <image> -m bmshj2018-factorized -q 1 -o out.bin
    python examples/codec.py decode out.bin -o dec.png
"""

from __future__ import annotations

import argparse
import struct
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from compressai_environment_tpu.datasets.image import load_image  # noqa: E402
from compressai_environment_tpu.zoo import image_models, models as zoo_models  # noqa: E402
from compressai_environment_tpu.zoo.image import _load_model, cfgs  # noqa: E402

# model id table mirrors the reference zoo ordering (image models then video)
model_ids = {k: i for i, k in enumerate(zoo_models.keys())}
metric_ids = {"mse": 0, "ms-ssim": 1}


def inverse_dict(d):
    assert len(d.keys()) == len(set(d.keys()))
    return {v: k for k, v in d.items()}


def filesize(filepath: str) -> int:
    return Path(filepath).stat().st_size


# -- binary framing (reference codec.py:115-140) ----------------------------

def write_uints(fd, values, fmt=">{:d}I"):
    fd.write(struct.pack(fmt.format(len(values)), *values))
    return len(values) * 4


def write_uchars(fd, values, fmt=">{:d}B"):
    fd.write(struct.pack(fmt.format(len(values)), *values))
    return len(values)


def read_uints(fd, n, fmt=">{:d}I"):
    sz = struct.calcsize("I")
    return struct.unpack(fmt.format(n), fd.read(n * sz))


def read_uchars(fd, n, fmt=">{:d}B"):
    return struct.unpack(fmt.format(n), fd.read(n))


def write_bytes(fd, values, fmt=">{:d}s"):
    if len(values) == 0:
        return 0
    fd.write(struct.pack(fmt.format(len(values)), values))
    return len(values)


def read_bytes(fd, n, fmt=">{:d}s"):
    return struct.unpack(fmt.format(n), fd.read(n))[0]


def get_header(model_name, metric, quality):
    """1-byte model id + (4-bit metric | 4-bit quality) byte."""
    code = (metric_ids[metric] << 4) | ((quality - 1) & 0x0F)
    return model_ids[model_name], code


def parse_header(header):
    model_id, code = header
    quality = (code & 0x0F) + 1
    metric = code >> 4
    return (
        inverse_dict(model_ids)[model_id],
        inverse_dict(metric_ids)[metric],
        quality,
    )


def read_body(fd):
    lstrings = []
    shape = read_uints(fd, 2)
    n_strings = read_uints(fd, 1)[0]
    for _ in range(n_strings):
        s = read_bytes(fd, read_uints(fd, 1)[0])
        lstrings.append([s])
    return lstrings, shape


def write_body(fd, shape, out_strings):
    bytes_cnt = write_uints(fd, (shape[0], shape[1], len(out_strings)))
    for s in out_strings:
        bytes_cnt += write_uints(fd, (len(s[0]),))
        bytes_cnt += write_bytes(fd, s[0])
    return bytes_cnt


# -- padding (reference codec.py:311-340) -----------------------------------

def pad(x: np.ndarray, p: int = 2**6) -> np.ndarray:
    h, w = x.shape[1:3]
    new_h = (h + p - 1) // p * p
    new_w = (w + p - 1) // p * p
    pl = (new_w - w) // 2
    pr = new_w - w - pl
    pt = (new_h - h) // 2
    pb = new_h - h - pt
    return np.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))


def crop(x: np.ndarray, size) -> np.ndarray:
    h, w = size
    H, W = x.shape[1:3]
    pl = (W - w) // 2
    pt = (H - h) // 2
    return x[:, pt : pt + h, pl : pl + w, :]


# -- video encode / decode ---------------------------------------------------


def encode_video(input, output, quality, coder, checkpoint=None):
    """ssf2020 GOP encode of a YUV420 sequence
    (reference ``codec.py:310-372``)."""
    from compressai_environment_tpu.datasets.rawvideo import (
        RawVideoSequence,
        VideoFormat,
    )
    from compressai_environment_tpu.utils.video.eval_model.__main__ import (
        to_rgb_frame,
        pad as vpad,
        write_frame_strings,
    )
    from compressai_environment_tpu.zoo import ssf2020

    if Path(input).suffix != ".yuv":
        raise NotImplementedError(f"Unsupported video file extension: {Path(input).suffix}")
    org_seq = RawVideoSequence.from_file(input)
    if org_seq.format != VideoFormat.YUV420:
        raise NotImplementedError(f"Unsupported video format: {org_seq.format}")
    bitdepth = org_seq.bitdepth
    max_val = 2**bitdepth - 1
    num_frames = org_seq.total_frms

    net = ssf2020(
        quality, pretrained=checkpoint is None, checkpoint_path=checkpoint
    )
    net.update()

    frames = [
        vpad(to_rgb_frame(org_seq[i], max_val))[0] for i in range(num_frames)
    ]

    enc_start = time.time()
    strings, shapes = net.compress(frames)
    enc_time = time.time() - enc_start

    with Path(output).open("wb") as f:
        write_uchars(f, (model_ids["ssf2020"], (0 << 4) | ((quality - 1) & 0x0F)))
        write_uints(f, (num_frames,))
        write_uints(f, (org_seq.height, org_seq.width))
        write_uchars(f, (bitdepth,))
        for i in range(num_frames):
            if i == 0:
                write_uints(f, (shapes[0][0], shapes[0][1]))
            else:
                write_uints(f, tuple(shapes[i]["motion"]) + tuple(shapes[i]["residual"]))
            write_frame_strings(f, strings[i])

    size = filesize(output)
    bpp = float(size) * 8 / (org_seq.height * org_seq.width * num_frames)
    print(f"{bpp:.3f} bpp | Encoded in {enc_time:.2f}s")
    org_seq.close()
    return {"bpp": bpp}


def decode_video(input, output, coder, checkpoint=None):
    from compressai_environment_tpu.utils.video.eval_model.__main__ import (
        crop as vcrop,
        pad as vpad,
        read_frame_strings,
        to_yuv420,
    )
    from compressai_environment_tpu.zoo import ssf2020

    dec_start = time.time()
    with Path(input).open("rb") as f:
        model_id, code = read_uchars(f, 2)
        quality = (code & 0x0F) + 1
        (num_frames,) = read_uints(f, 1)
        original_size = read_uints(f, 2)
        (bitdepth,) = read_uchars(f, 1)
        strings, shapes = [], []
        for i in range(num_frames):
            if i == 0:
                shapes.append(tuple(read_uints(f, 2)))
            else:
                v = read_uints(f, 4)
                shapes.append({"motion": v[:2], "residual": v[2:]})
            strings.append(read_frame_strings(f, None))

    net = ssf2020(
        quality, pretrained=checkpoint is None, checkpoint_path=checkpoint
    )
    net.update()
    dec_frames = net.decompress(strings, shapes)

    # recover padding geometry from the original size
    probe = np.zeros((1, original_size[0], original_size[1], 3), np.float32)
    _, padding = vpad(probe)

    max_val = 2**bitdepth - 1
    dtype = np.uint8 if bitdepth == 8 else np.uint16
    if output is not None:
        with Path(output).open("wb") as fout:
            for fr in dec_frames:
                rgb = vcrop(np.asarray(fr), padding)
                y, u, v = to_yuv420(np.clip(rgb, 0, 1))
                for plane in (y, u, v):
                    (np.clip(plane[0], 0, 1) * max_val).round().astype(dtype).tofile(fout)
    print(f"Decoded in {time.time() - dec_start:.2f}s")
    return dec_frames


# -- image encode / decode ---------------------------------------------------

def encode_image(input, output, model, metric, quality, coder, checkpoint=None):
    img = load_image(input)[None]
    h, w = img.shape[1:3]
    x = pad(img, 64)

    net = _load_model(
        model, metric, quality,
        pretrained=checkpoint is None, checkpoint_path=checkpoint,
    )
    net.update()

    enc_start = time.time()
    out = net.compress(x)
    enc_time = time.time() - enc_start

    shape = out["shape"]
    with Path(output).open("wb") as f:
        write_uchars(f, get_header(model, metric, quality))
        write_uints(f, (h, w))
        write_uchars(f, (8,))  # bitdepth
        write_body(f, shape, out["strings"])

    size = filesize(output)
    bpp = float(size) * 8 / (h * w)
    print(f"{bpp:.3f} bpp | Encoded in {enc_time:.2f}s")
    return {"bpp": bpp}


def decode_image(input, output, coder, checkpoint=None):
    dec_start = time.time()
    with Path(input).open("rb") as f:
        model, metric, quality = parse_header(read_uchars(f, 2))
        original_size = read_uints(f, 2)
        read_uchars(f, 1)  # bitdepth
        strings, shape = read_body(f)

    net = _load_model(
        model, metric, quality,
        pretrained=checkpoint is None, checkpoint_path=checkpoint,
    )
    net.update()
    out = net.decompress(strings, shape)
    x_hat = crop(np.asarray(out["x_hat"]), original_size)
    dec_time = time.time() - dec_start
    print(f"Decoded in {dec_time:.2f}s")

    if output is not None:
        from PIL import Image

        arr = (np.clip(x_hat[0], 0, 1) * 255).round().astype(np.uint8)
        Image.fromarray(arr).save(output)
    return x_hat


def main(argv):
    parser = argparse.ArgumentParser(description="Encode/decode images with learned codecs.")
    sub = parser.add_subparsers(dest="command", required=True)

    enc = sub.add_parser("encode")
    enc.add_argument("input")
    enc.add_argument("-o", "--output", default="out.bin")
    enc.add_argument("-m", "--model", default="bmshj2018-factorized",
                     choices=list(zoo_models.keys()))
    enc.add_argument("-M", "--metric", default="mse", choices=["mse", "ms-ssim"])
    enc.add_argument("-q", "--quality", type=int, default=1)
    enc.add_argument("-c", "--coder", default="ans")
    enc.add_argument("--checkpoint", default=None,
                     help="local checkpoint path (skips download)")

    dec = sub.add_parser("decode")
    dec.add_argument("input")
    dec.add_argument("-o", "--output", default=None)
    dec.add_argument("-c", "--coder", default="ans")
    dec.add_argument("--checkpoint", default=None)

    args = parser.parse_args(argv)
    if args.command == "encode":
        if args.model == "ssf2020" or Path(args.input).suffix == ".yuv" and args.model == "ssf2020":
            encode_video(args.input, args.output, args.quality, args.coder,
                         args.checkpoint)
        else:
            encode_image(args.input, args.output, args.model, args.metric,
                         args.quality, args.coder, args.checkpoint)
    else:
        with Path(args.input).open("rb") as f:
            model_id = read_uchars(f, 1)[0]
        if inverse_dict(model_ids)[model_id] == "ssf2020":
            decode_video(args.input, args.output, args.coder, args.checkpoint)
        else:
            decode_image(args.input, args.output, args.coder, args.checkpoint)


if __name__ == "__main__":
    main(sys.argv[1:])
