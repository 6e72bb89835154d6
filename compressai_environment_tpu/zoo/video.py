"""Video-codec model zoo (reference ``zoo/video.py``)."""

from __future__ import annotations

from ..models.video import ScaleSpaceFlow
from .torch_import import load_pretrained

__all__ = ["ssf2020", "video_model_architectures"]

video_model_architectures = {"ssf2020": ScaleSpaceFlow}

root_url = "https://compressai.s3.amazonaws.com/models/v1"
model_urls = {
    "ssf2020": {
        "mse": {
            q: f"{root_url}/ssf2020-mse-{q}-HASH.pth.tar" for q in range(1, 10)
        }
    }
}


def ssf2020(quality, metric="mse", pretrained=False, progress=True,
            checkpoint_path=None, **kwargs):
    """Scale-space flow video codec (Agustsson et al., CVPR 2020).

    Args:
        quality: 1 (lowest) to 9.
        metric: optimized metric ("mse" only for pretrained).
        pretrained: load a pretrained CompressAI checkpoint (needs network).
        checkpoint_path: local checkpoint (torch or native msgpack).
    """
    if metric not in ("mse", "ms-ssim"):
        raise ValueError(f'Invalid metric "{metric}"')
    if quality < 1 or quality > 9:
        raise ValueError(f'Invalid quality "{quality}", should be between (1, 9)')

    model = ScaleSpaceFlow(**kwargs)

    if checkpoint_path is not None:
        from pathlib import Path

        from .image import _TORCH_SUFFIXES, _load_checkpoint_file
        from .torch_import import load_state_dict_video

        if Path(checkpoint_path).suffix in _TORCH_SUFFIXES:
            sd = load_pretrained(_load_checkpoint_file(checkpoint_path))
            model.init()
            load_state_dict_video(model, sd)
        else:
            from ..utils.checkpoint import restore_into

            restore_into(model, checkpoint_path)
        return model

    if pretrained:
        from torch.hub import load_state_dict_from_url

        from .torch_import import load_state_dict_video

        url = model_urls["ssf2020"][metric][quality]
        sd = load_pretrained(load_state_dict_from_url(url, progress=progress))
        model.init()
        load_state_dict_video(model, sd)
        return model

    model.init()
    return model
