"""ssf2020 video training example on Vimeo90K-style triplets
(reference ``examples/train_video.py``).

Usage:
    python examples/train_video.py -d /path/to/vimeo --epochs 5 --lambda 0.01
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def random_crop_frames(rng, frames, size):
    h, w = frames[0].shape[:2]
    top = rng.integers(0, max(1, h - size + 1))
    left = rng.integers(0, max(1, w - size + 1))
    return [f[top : top + size, left : left + size] for f in frames]


def main(argv=None):
    parser = argparse.ArgumentParser(description="Video training script.")
    parser.add_argument("-d", "--dataset", required=True)
    parser.add_argument("-e", "--epochs", type=int, default=100)
    parser.add_argument("-lr", "--learning-rate", type=float, default=1e-4)
    parser.add_argument("--lambda", dest="lmbda", type=float, default=1e-2)
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--aux-learning-rate", type=float, default=1e-3)
    parser.add_argument("--patch-size", type=int, nargs=2, default=(256, 256))
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--clip_max_norm", type=float, default=1.0)
    parser.add_argument("--checkpoint", type=str)
    parser.add_argument("--save-path", type=str, default="ssf_checkpoint.msgpack")
    args = parser.parse_args(argv)

    import jax
    import optax

    from compressai_environment_tpu.datasets import VideoFolder
    from compressai_environment_tpu.models.video import ScaleSpaceFlow
    from compressai_environment_tpu.models.video.ssf import ScaleSpaceFlowNet
    from compressai_environment_tpu.training import init_train_state
    from compressai_environment_tpu.training.losses import video_rate_distortion_loss
    from compressai_environment_tpu.utils.checkpoint import (
        restore_into,
        save_checkpoint,
    )

    model = ScaleSpaceFlow().init(
        key=jax.random.key(args.seed),
        input_shape=(1, args.patch_size[0], args.patch_size[1], 3),
    )
    if args.checkpoint:
        restore_into(model, args.checkpoint)

    state, (main_tx, aux_tx) = init_train_state(
        model.params,
        learning_rate=args.learning_rate,
        aux_learning_rate=args.aux_learning_rate,
        max_grad_norm=args.clip_max_norm,
    )

    def step(state, frames, key):
        def rd_loss(params):
            out = model.net.apply(
                {"params": params}, frames, True, rngs={"noise": key}
            )
            losses = video_rate_distortion_loss(out, frames, args.lmbda)
            return losses["loss"], losses

        (_, losses), grads = jax.value_and_grad(rd_loss, has_aux=True)(state.params)
        updates, main_opt = main_tx.update(grads, state.main_opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        def aux_loss(params):
            return sum(
                model.net.apply(
                    {"params": params}, method=ScaleSpaceFlowNet.aux_loss_list
                )
            )

        aux_val, aux_grads = jax.value_and_grad(aux_loss)(params)
        aux_updates, aux_opt = aux_tx.update(aux_grads, state.aux_opt_state, params)
        params = optax.apply_updates(params, aux_updates)
        losses = dict(losses)
        losses["aux_loss"] = aux_val
        return state._replace(
            params=params, main_opt_state=main_opt, aux_opt_state=aux_opt,
            step=state.step + 1,
        ), losses

    jitted = jax.jit(step)

    ds = VideoFolder(args.dataset, rnd_interval=True, rnd_temp_order=True,
                     transform=lambda x: x, split="train")
    rng = np.random.default_rng(args.seed)
    key = jax.random.key(args.seed + 1)

    for epoch in range(args.epochs):
        t0 = time.time()
        order = rng.permutation(len(ds))
        losses = {}
        for i in range(0, len(order) - args.batch_size + 1, args.batch_size):
            clips = [ds[int(j)] for j in order[i : i + args.batch_size]]
            clips = [
                random_crop_frames(rng, c, args.patch_size[0]) for c in clips
            ]
            frames = [
                np.stack([c[t] for c in clips]).astype(np.float32)
                for t in range(3)
            ]
            key, sub = jax.random.split(key)
            state, losses = jitted(state, frames, sub)
            if (i // args.batch_size) % 10 == 0:
                print(
                    f"Train epoch {epoch}: [{i}/{len(ds)}] "
                    f"Loss: {float(losses['loss']):.3f} | "
                    f"Bpp: {float(losses['bpp_loss']):.3f} | "
                    f"Aux: {float(losses['aux_loss']):.1f}"
                )
        print(f"Epoch {epoch} done in {time.time()-t0:.1f}s")
        model.params = jax.device_get(state.params)
        save_checkpoint(model, args.save_path, architecture="ssf2020",
                        extra={"epoch": epoch, "lmbda": args.lmbda})

    return state


if __name__ == "__main__":
    main()
