"""Post-training export: bake CDF tables into a checkpoint and rename it with
a sha256 prefix for hub-style loading.

CLI re-implementation of reference ``utils/update_model/__main__.py``: loads
a training checkpoint (native msgpack or torch ``.pth.tar``, unwrapping
``network`` / ``state_dict`` containers), runs ``update(force=True)`` to
rebuild the quantized CDFs, and writes ``<name>-<sha256[:8]>.bin``.

Usage:
    python -m compressai_environment_tpu.utils.update_model \
        -a bmshj2018-factorized -n export ckpt.msgpack
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def setup_args():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("filepath", type=str, help="checkpoint path")
    parser.add_argument(
        "-n", "--name", type=str, default="",
        help="output checkpoint name (default: input name)",
    )
    parser.add_argument("-d", "--dir", type=str, default=".", help="output directory")
    parser.add_argument(
        "-a", "--architecture", required=True, type=str,
        help="model architecture name",
    )
    parser.add_argument(
        "-q", "--quality", type=int, default=1,
        help="channel-config quality used to build the model",
    )
    parser.add_argument("--no-update", action="store_true",
                        help="do not re-bake the CDF tables")
    return parser


def main(argv):
    args = setup_args().parse_args(argv)

    from ...zoo.image import _load_model, model_architectures
    from ..checkpoint import restore_into, save_checkpoint, sha256_file

    if args.architecture not in model_architectures:
        raise ValueError(f'Invalid architecture "{args.architecture}"')

    filepath = Path(args.filepath).resolve()
    if not filepath.is_file():
        raise RuntimeError(f'"{filepath}" is not a valid file.')

    if filepath.suffix in (".tar", ".pth", ".pt"):
        model = _load_model(
            args.architecture, "mse", args.quality, checkpoint_path=str(filepath)
        )
    else:
        model = _load_model(args.architecture, "mse", args.quality)
        restore_into(model, filepath)

    if not args.no_update:
        model.update(force=True)

    name = args.name or filepath.stem
    out_dir = Path(args.dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    tmp_path = out_dir / f"{name}.bin"
    save_checkpoint(model, tmp_path, architecture=args.architecture)

    digest = sha256_file(tmp_path)
    final_path = out_dir / f"{name}-{digest[:8]}.bin"
    tmp_path.rename(final_path)
    print(final_path)


if __name__ == "__main__":
    main(sys.argv[1:])
