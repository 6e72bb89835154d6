from .image import (
    bmshj2018_factorized,
    bmshj2018_hyperprior,
    cfgs,
    cheng2020_anchor,
    cheng2020_attn,
    mbt2018,
    mbt2018_mean,
    model_architectures,
)
from .torch_import import load_pretrained, load_state_dict, load_state_dict_video, rename_key
from .video import ssf2020

image_models = {
    "bmshj2018-factorized": bmshj2018_factorized,
    "bmshj2018-hyperprior": bmshj2018_hyperprior,
    "mbt2018-mean": mbt2018_mean,
    "mbt2018": mbt2018,
    "cheng2020-anchor": cheng2020_anchor,
    "cheng2020-attn": cheng2020_attn,
}

video_models = {"ssf2020": ssf2020}
models = {**image_models, **video_models}

__all__ = [
    "bmshj2018_factorized",
    "bmshj2018_hyperprior",
    "mbt2018",
    "mbt2018_mean",
    "cheng2020_anchor",
    "cheng2020_attn",
    "image_models",
    "video_models",
    "models",
    "cfgs",
    "model_architectures",
    "ssf2020",
    "load_pretrained",
    "load_state_dict_video",
    "load_state_dict",
    "rename_key",
]
