"""Train a real ssf2020 checkpoint on synthetic video (round-4 VERDICT #5).

The reference ships trained ssf2020 RD results
(results/video/UVG-1080p/ssf2020-mse-ans-vimeo.json); with no egress the
equivalent loop closes like the image side (tools/train_synth.py): train on
a procedurally generated, temporally-correlated triplet distribution so the
GOP operating point lands in a realistic bpp range, bake tables with
update(force=True), commit the checkpoint, and let bench/results run at it.

Motion model of the content family: global subpixel translation per frame
(bilinear sampling) + slow brightness drift + sensor noise — enough
structure for the motion branch to earn its bits.

Run: ``python tools/train_synth_video.py --steps 1500``  (TPU)
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from train_synth import synth_image


def _translate(img: np.ndarray, dx: float, dy: float) -> np.ndarray:
    """Bilinear global translation with edge clamp."""
    h, w = img.shape[:2]
    ix, fx = int(np.floor(dx)), dx - np.floor(dx)
    iy, fy = int(np.floor(dy)), dy - np.floor(dy)

    def shift(a, sy, sx):
        a = np.roll(a, (sy, sx), axis=(0, 1))
        return a

    a = shift(img, iy, ix)
    b = shift(img, iy, ix + 1)
    c = shift(img, iy + 1, ix)
    d = shift(img, iy + 1, ix + 1)
    return (
        (1 - fy) * ((1 - fx) * a + fx * b) + fy * ((1 - fx) * c + fx * d)
    ).astype(np.float32)


def synth_triplet(rng: np.random.Generator, h: int, w: int):
    """3 temporally-correlated frames (h, w, 3) in [0, 1]."""
    base = synth_image(rng, h + 16, w + 16)
    vx, vy = rng.uniform(-3.0, 3.0, size=2)
    gain = rng.uniform(-0.02, 0.02)
    frames = []
    for t in range(3):
        f = _translate(base, vx * t, vy * t)[8 : 8 + h, 8 : 8 + w]
        f = np.clip(f * (1 + gain * t), 0, 1)
        f = np.clip(f + 0.01 * rng.standard_normal(f.shape), 0, 1)
        frames.append(f.astype(np.float32))
    return frames


def synth_triplet_batch(seed: int, n: int, h: int, w: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return np.stack(
        [np.stack(synth_triplet(rng, h, w)) for _ in range(n)]
    )  # (n, 3, h, w, 3)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--patch", type=int, default=256)
    p.add_argument("--lambda", dest="lmbda", type=float, default=0.01)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--aux-lr", type=float, default=1e-2)
    p.add_argument("--n-train", type=int, default=192)
    p.add_argument("--eval-every", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="checkpoints/ssf2020-synth-q3.msgpack")
    p.add_argument("--save-every", type=int, default=0,
                   help="also bake+save the checkpoint every N steps "
                        "(long runs survive interruption)")
    p.add_argument("--init-from", default=None,
                   help="warm-start params from an existing checkpoint "
                        "(fine-tune at a different lambda: the multi-"
                        "quality sweep converges far faster than from "
                        "scratch)")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import optax

    from compressai_environment_tpu.models.video import ScaleSpaceFlow
    from compressai_environment_tpu.models.video.ssf import ScaleSpaceFlowNet
    from compressai_environment_tpu.training import (
        PlateauScheduler,
        init_train_state,
        set_learning_rate,
    )
    from compressai_environment_tpu.training.losses import (
        video_rate_distortion_loss,
    )
    from compressai_environment_tpu.utils.checkpoint import save_checkpoint

    model = ScaleSpaceFlow().init(
        input_shape=(1, args.patch, args.patch, 3)
    )
    if args.init_from:
        from compressai_environment_tpu.utils.checkpoint import restore_into

        restore_into(model, args.init_from)
        print(f"warm-started from {args.init_from}", flush=True)
    state, (main_tx, aux_tx) = init_train_state(
        model.params, learning_rate=args.lr, aux_learning_rate=args.aux_lr,
        max_grad_norm=1.0,
    )

    print(f"generating {args.n_train} synthetic triplets ...", flush=True)
    t0 = time.time()
    train_np = synth_triplet_batch(
        args.seed + 1, args.n_train, args.patch, args.patch
    )
    eval_np = synth_triplet_batch(args.seed + 2, 8, args.patch, args.patch)
    train_dev = jnp.asarray((train_np * 255).round().astype(np.uint8))
    eval_frames = [jnp.asarray(eval_np[:, t]) for t in range(3)]
    print(f"  done in {time.time()-t0:.1f}s", flush=True)

    net = model.net

    @jax.jit
    def step_fn(st, idx, key):
        batch = train_dev[idx].astype(jnp.float32) / 255.0
        frames = [batch[:, t] for t in range(3)]

        def rd_loss(params):
            out = net.apply(
                {"params": params}, frames, True, rngs={"noise": key}
            )
            losses = video_rate_distortion_loss(out, frames, args.lmbda)
            return losses["loss"], losses

        (_, losses), grads = jax.value_and_grad(rd_loss, has_aux=True)(
            st.params
        )
        updates, main_opt = main_tx.update(grads, st.main_opt_state, st.params)
        params = optax.apply_updates(st.params, updates)

        def aux_loss(params):
            return sum(
                net.apply(
                    {"params": params}, method=ScaleSpaceFlowNet.aux_loss_list
                )
            )

        aux_val, aux_grads = jax.value_and_grad(aux_loss)(params)
        aux_updates, aux_opt = aux_tx.update(
            aux_grads, st.aux_opt_state, params
        )
        params = optax.apply_updates(params, aux_updates)
        losses = dict(losses)
        losses["aux_loss"] = aux_val
        return type(st)(
            params=params, main_opt_state=main_opt, aux_opt_state=aux_opt,
            step=st.step + 1,
        ), losses

    # eval frames passed as jit arguments, not closure constants: the TPU
    # backend constant-folds closed-over float operands through the conv
    # pipeline with degraded numerics (see tools/train_synth.py)
    @jax.jit
    def eval_fn(params, frames):
        out = net.apply(
            {"params": params}, list(frames), False,
            rngs={"noise": jax.random.key(9)},
        )
        return video_rate_distortion_loss(out, list(frames), args.lmbda)

    def bake_and_save(params, step_no):
        model.params = jax.device_get(params)
        model.update(force=True)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        save_checkpoint(
            model, args.out, architecture="ssf2020",
            extra={"lmbda": args.lmbda, "steps": step_no, "seed": args.seed,
                   "train": "synthetic-video-v1"},
        )
        print(f"  [saved {args.out} @ step {step_no}]", flush=True)

    scheduler = PlateauScheduler(args.lr, patience=8)
    rng = np.random.default_rng(args.seed + 3)
    key = jax.random.key(args.seed + 4)
    t0 = time.time()
    for i in range(args.steps):
        idx = jnp.asarray(rng.integers(0, args.n_train, args.batch_size))
        key, sub = jax.random.split(key)
        state, losses = step_fn(state, idx, sub)
        if (i + 1) % args.eval_every == 0 or i == 0:
            ev = {k: float(v)
                  for k, v in eval_fn(state.params,
                                      tuple(eval_frames)).items()}
            lr = scheduler.step(ev["loss"])
            state = state._replace(
                main_opt_state=set_learning_rate(state.main_opt_state, lr)
            )
            rate = (i + 1) / (time.time() - t0)
            psnr = 10 * np.log10(1.0 / max(ev["mse_loss"], 1e-12))
            print(
                f"step {i+1:5d} | eval loss {ev['loss']:.4f} "
                f"bpp {ev['bpp_loss']:.3f} mse {ev['mse_loss']:.5f} "
                f"({psnr:.2f} dB) | lr {lr:g} | {rate:.2f} it/s",
                flush=True,
            )
        if args.save_every and (i + 1) % args.save_every == 0 and i + 1 < args.steps:
            bake_and_save(state.params, i + 1)

    model.params = jax.device_get(state.params)
    model.update(force=True)

    # honesty check: real coded bpp on a held-out GOP
    model.stream_format = "tpu"
    frames = [np.asarray(eval_np[:2, t]) for t in range(3)]
    strings, shapes = model.compress(frames)

    def _count(obj):
        if isinstance(obj, dict):
            return sum(_count(v) for v in obj.values())
        if isinstance(obj, (list, tuple)):
            return sum(_count(v) for v in obj)
        return len(obj)

    bpp = _count(strings) * 8 / (2 * 3 * args.patch * args.patch)
    print(f"coded bpp on held-out GOP: {bpp:.4f}", flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_checkpoint(
        model, args.out, architecture="ssf2020",
        extra={"lmbda": args.lmbda, "steps": args.steps, "seed": args.seed,
               "train": "synthetic-video-v1", "coded_bpp_heldout": round(bpp, 4)},
    )
    print(f"saved {args.out}", flush=True)


if __name__ == "__main__":
    main()
