"""Image-codec model zoo (reference ``zoo/image.py``).

Entry points construct models at the published per-quality channel configs
and optionally load pretrained CompressAI checkpoints. Checkpoints are
ingested from *local* files (``checkpoint_path=``) or, when network access is
available, from the CompressAI S3 bucket via ``torch.hub`` — the URL table is
kept verbatim for that purpose. Baked CDF tables in the checkpoint are
imported as-is so bitstreams match the reference bit-for-bit.
"""

from __future__ import annotations

from ..models import (
    Cheng2020Anchor,
    Cheng2020Attention,
    FactorizedPrior,
    JointAutoregressiveHierarchicalPriors,
    MeanScaleHyperprior,
    ScaleHyperprior,
)
from .torch_import import load_pretrained, load_state_dict

__all__ = [
    "bmshj2018_factorized",
    "bmshj2018_hyperprior",
    "mbt2018",
    "mbt2018_mean",
    "cheng2020_anchor",
    "cheng2020_attn",
    "model_architectures",
    "cfgs",
]

model_architectures = {
    "bmshj2018-factorized": FactorizedPrior,
    "bmshj2018-hyperprior": ScaleHyperprior,
    "mbt2018-mean": MeanScaleHyperprior,
    "mbt2018": JointAutoregressiveHierarchicalPriors,
    "cheng2020-anchor": Cheng2020Anchor,
    "cheng2020-attn": Cheng2020Attention,
}

root_url = "https://compressai.s3.amazonaws.com/models/v1"

# Per-quality channel configurations (reference zoo/image.py:189-246)
cfgs = {
    "bmshj2018-factorized": {
        1: (128, 192), 2: (128, 192), 3: (128, 192), 4: (128, 192),
        5: (128, 192), 6: (192, 320), 7: (192, 320), 8: (192, 320),
    },
    "bmshj2018-hyperprior": {
        1: (128, 192), 2: (128, 192), 3: (128, 192), 4: (128, 192),
        5: (128, 192), 6: (192, 320), 7: (192, 320), 8: (192, 320),
    },
    "mbt2018-mean": {
        1: (128, 192), 2: (128, 192), 3: (128, 192), 4: (128, 192),
        5: (192, 320), 6: (192, 320), 7: (192, 320), 8: (192, 320),
    },
    "mbt2018": {
        1: (192, 192), 2: (192, 192), 3: (192, 192), 4: (192, 192),
        5: (192, 320), 6: (192, 320), 7: (192, 320), 8: (192, 320),
    },
    "cheng2020-anchor": {
        1: (128,), 2: (128,), 3: (128,), 4: (192,), 5: (192,), 6: (192,),
    },
    "cheng2020-attn": {
        1: (128,), 2: (128,), 3: (128,), 4: (192,), 5: (192,), 6: (192,),
    },
}

_max_quality = {
    "bmshj2018-factorized": 8,
    "bmshj2018-hyperprior": 8,
    "mbt2018-mean": 8,
    "mbt2018": 8,
    "cheng2020-anchor": 6,
    "cheng2020-attn": 6,
}


_TORCH_SUFFIXES = (".pth", ".tar", ".pt")


def _load_checkpoint_file(path):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("network", "state_dict", "model_state_dict"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    return ckpt


def _infer_dims_torch(architecture, state_dict):
    """Channel dims from a torch state dict (reference ``from_state_dict``:
    ``models/google.py:173-180``, ``models/waseda.py:105-110``)."""
    if architecture.startswith("cheng2020"):
        return (int(state_dict["g_a.0.conv1.weight"].shape[0]),)
    return (
        int(state_dict["g_a.0.weight"].shape[0]),
        int(state_dict["g_a.6.weight"].shape[0]),
    )


def _infer_dims_native(architecture, params):
    """Channel dims from a flax params tree."""
    if architecture.startswith("cheng2020"):
        return (int(params["g_a"]["0"]["conv1"]["kernel"].shape[-1]),)
    return (
        int(params["g_a"]["0"]["kernel"].shape[-1]),
        int(params["g_a"]["6"]["kernel"].shape[-1]),
    )


def _from_torch_checkpoint(architecture, path):
    state_dict = load_pretrained(
        {k: v for k, v in _load_checkpoint_file(path).items()}
    )
    dims = _infer_dims_torch(architecture, state_dict)
    model = model_architectures[architecture](*dims)
    model.init()
    load_state_dict(model, state_dict)
    return model


def _from_native_checkpoint(architecture, path):
    from ..utils.checkpoint import load_checkpoint

    params, tables, scale_table, meta = load_checkpoint(path)
    architecture = meta.get("architecture") or architecture
    dims = _infer_dims_native(architecture, params)
    model = model_architectures[architecture](*dims)
    model.params = params
    model.tables = tables
    if scale_table is not None:
        model.scale_table = scale_table
    return model


def _load_model(
    architecture,
    metric,
    quality,
    pretrained=False,
    progress=True,
    checkpoint_path=None,
    **kwargs,
):
    if architecture not in model_architectures:
        raise ValueError(f'Invalid architecture name "{architecture}"')
    if quality not in cfgs[architecture]:
        raise ValueError(f'Invalid quality value "{quality}"')

    if checkpoint_path is not None:
        from pathlib import Path

        if Path(checkpoint_path).suffix in _TORCH_SUFFIXES:
            return _from_torch_checkpoint(architecture, checkpoint_path)
        return _from_native_checkpoint(architecture, checkpoint_path)

    if pretrained:
        from torch.hub import load_state_dict_from_url

        url = f"{root_url}/{architecture}-{quality}-{metric}.pth.tar"
        state_dict = load_state_dict_from_url(url, progress=progress)
        state_dict = load_pretrained(state_dict)
        dims = _infer_dims_torch(architecture, state_dict)
        model = model_architectures[architecture](*dims)
        model.init()
        load_state_dict(model, state_dict)
        return model

    model = model_architectures[architecture](*cfgs[architecture][quality], **kwargs)
    model.init()
    return model


def _entry(architecture, max_q):
    def entry(quality, metric="mse", pretrained=False, progress=True, **kwargs):
        if metric not in ("mse", "ms-ssim"):
            raise ValueError(f'Invalid metric "{metric}"')
        if quality < 1 or quality > max_q:
            raise ValueError(
                f'Invalid quality "{quality}", should be between (1, {max_q})'
            )
        return _load_model(
            architecture, metric, quality, pretrained, progress, **kwargs
        )

    entry.__name__ = architecture.replace("-", "_")
    return entry


bmshj2018_factorized = _entry("bmshj2018-factorized", 8)
bmshj2018_hyperprior = _entry("bmshj2018-hyperprior", 8)
mbt2018_mean = _entry("mbt2018-mean", 8)
mbt2018 = _entry("mbt2018", 8)
cheng2020_anchor = _entry("cheng2020-anchor", 6)
cheng2020_attn = _entry("cheng2020-attn", 6)
