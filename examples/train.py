"""Image-codec training example (reference ``examples/train.py``).

Rate-distortion objective ``L = lambda * 255^2 * MSE + bpp`` with the
two-optimizer split (main: all params except quantiles; aux: quantiles),
gradient clipping, ReduceLROnPlateau-style LR decay, and checkpoint
save/resume. Data parallelism is mesh-native: batches are sharded over the
``dp`` axis (cf. the reference's experimental ``CustomDataParallel``).

Usage:
    python examples/train.py -d /path/to/imagefolder --epochs 10 --lambda 0.01
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def random_crop(rng, img, size):
    h, w = img.shape[:2]
    if h < size or w < size:  # upscale-pad tiny images
        reps = (max(1, -(-size // h)), max(1, -(-size // w)), 1)
        img = np.tile(img, reps)
        h, w = img.shape[:2]
    top = rng.integers(0, h - size + 1)
    left = rng.integers(0, w - size + 1)
    return img[top : top + size, left : left + size]


def batched(dataset, batch_size, patch, seed):
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(dataset))
    for i in range(0, len(order) - batch_size + 1, batch_size):
        batch = np.stack(
            [random_crop(rng, dataset[int(j)], patch) for j in order[i : i + batch_size]]
        )
        yield batch


def center_crop(img, size):
    h, w = img.shape[:2]
    if h < size or w < size:
        reps = (max(1, -(-size // h)), max(1, -(-size // w)), 1)
        img = np.tile(img, reps)
        h, w = img.shape[:2]
    top, left = (h - size) // 2, (w - size) // 2
    return img[top : top + size, left : left + size]


def test_batches(dataset, batch_size, patch):
    """Deterministic eval batches (reference test set uses CenterCrop,
    ``examples/train.py:293-296``); a short tail batch is dropped only if a
    full batch exists, so tiny datasets still evaluate."""
    n = len(dataset)
    step = min(batch_size, n)
    for i in range(0, n - step + 1, step):
        yield np.stack(
            [center_crop(dataset[int(j)], patch) for j in range(i, i + step)]
        )


def main(argv=None):
    parser = argparse.ArgumentParser(description="Training script.")
    parser.add_argument("-m", "--model", default="bmshj2018-factorized",
                        help="Model architecture (default: %(default)s)")
    parser.add_argument("-d", "--dataset", required=True, help="Training dataset")
    parser.add_argument("-e", "--epochs", type=int, default=100)
    parser.add_argument("-lr", "--learning-rate", type=float, default=1e-4)
    parser.add_argument("-n", "--num-workers", type=int, default=4)
    parser.add_argument("--lambda", dest="lmbda", type=float, default=1e-2,
                        help="Bit-rate distortion parameter (default: %(default)s)")
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--test-batch-size", type=int, default=64)
    parser.add_argument("--aux-learning-rate", type=float, default=1e-3)
    parser.add_argument("--patch-size", type=int, nargs=2, default=(256, 256))
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--clip_max_norm", type=float, default=1.0)
    parser.add_argument("--quality", type=int, default=1)
    parser.add_argument("--checkpoint", type=str, help="Path to a checkpoint")
    parser.add_argument("--save", action="store_true", default=True)
    parser.add_argument("--save-path", type=str, default="checkpoint.msgpack")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard batches over all local devices")
    from compressai_environment_tpu.parallel.distributed import (
        add_distributed_args,
        maybe_initialize,
    )

    add_distributed_args(parser)
    args = parser.parse_args(argv)

    # must precede any backend use; with --distributed the mesh spans all
    # processes (dp over DCN across hosts, tp on ICI within a slice)
    pidx, pcount = maybe_initialize(args)
    if pcount > 1:
        args.data_parallel = True  # multi-process implies the global mesh

    import jax

    from compressai_environment_tpu.datasets import ImageFolder
    from compressai_environment_tpu.training import (
        PlateauScheduler,
        eval_step,
        init_train_state,
        rate_distortion_loss,
        set_learning_rate,
        train_step,
    )
    from compressai_environment_tpu.utils.checkpoint import (
        load_train_checkpoint,
        save_checkpoint,
        save_train_checkpoint,
    )
    from compressai_environment_tpu.zoo.image import _load_model

    seed = args.seed if args.seed is not None else 0
    key = jax.random.key(seed)

    model = _load_model(args.model, "mse", args.quality)

    state, txs = init_train_state(
        model.params,
        learning_rate=args.learning_rate,
        aux_learning_rate=args.aux_learning_rate,
        max_grad_norm=args.clip_max_norm,
    )
    scheduler = PlateauScheduler(args.learning_rate)
    start_epoch = 0
    best_loss = float("inf")
    if args.checkpoint:
        # full train resume: params + both optimizers + scheduler + epoch +
        # RNG key (reference examples/train.py:331-338)
        state, scheduler, last_epoch, ckpt_key, best_loss, _ = (
            load_train_checkpoint(args.checkpoint, state, scheduler)
        )
        start_epoch = last_epoch + 1
        if ckpt_key is not None:
            key = ckpt_key
        state = state._replace(
            main_opt_state=set_learning_rate(state.main_opt_state, scheduler.lr)
        )
        model.params = state.params
        print(f"Resumed from {args.checkpoint} at epoch {start_epoch}")

    train_ds = ImageFolder(args.dataset, split="train")
    try:
        test_ds = ImageFolder(args.dataset, split="test")
    except (FileNotFoundError, RuntimeError):
        # no held-out split: fall back to scheduling on the train loss
        test_ds = None
        print("warning: no test/ split found; LR plateau steps on train loss")
    patch = args.patch_size[0]

    if args.data_parallel and jax.device_count() > 1:
        from compressai_environment_tpu.parallel import make_mesh, make_sharded_train_step

        mesh = make_mesh()
        step_fn = make_sharded_train_step(
            model.net, mesh, txs, args.lmbda, rate_distortion_loss
        )
        state = step_fn.place_state(state)
    else:
        jitted = jax.jit(
            lambda s, b, k: train_step(
                model.net, s, txs, b, k, args.lmbda, rate_distortion_loss
            )
        )
        step_fn = jitted

    eval_fn = jax.jit(
        lambda p, b: eval_step(model.net, p, b, args.lmbda, rate_distortion_loss)
    )

    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        losses = {}
        nsteps = 0
        for i, batch in enumerate(batched(train_ds, args.batch_size, patch, seed + epoch)):
            key, sub = jax.random.split(key)
            if pcount > 1:
                # every process generates the identical (seeded) global
                # batch and feeds its interleaved slice to the global mesh
                batch = batch[pidx::pcount]
            state, losses = step_fn(state, batch, sub)
            nsteps += 1
            if i % 10 == 0 and pidx == 0:
                print(
                    f"Train epoch {epoch}: [{i*args.batch_size}/{len(train_ds)}] "
                    f"Loss: {float(losses['loss']):.3f} | "
                    f"MSE loss: {float(losses['mse_loss']):.5f} | "
                    f"Bpp loss: {float(losses['bpp_loss']):.2f} | "
                    f"Aux loss: {float(losses['aux_loss']):.2f}"
                )
        if not nsteps:
            raise RuntimeError("dataset smaller than one batch")

        # per-epoch held-out evaluation; the LR plateau steps on the TEST
        # loss, as the reference does (examples/train.py:327-330)
        params = state.params
        if test_ds is not None and len(test_ds):
            sums, cnt = {}, 0
            for tb in test_batches(test_ds, args.test_batch_size, patch):
                tl = eval_fn(params, tb)
                for k, v in tl.items():
                    sums[k] = sums.get(k, 0.0) + float(v) * len(tb)
                cnt += len(tb)
            test_losses = {k: v / cnt for k, v in sums.items()}
            print(
                f"Test epoch {epoch}: Average losses: "
                f"Loss: {test_losses['loss']:.3f} | "
                f"MSE loss: {test_losses['mse_loss']:.5f} | "
                f"Bpp loss: {test_losses['bpp_loss']:.2f} | "
                f"Aux loss: {test_losses['aux_loss']:.2f}"
            )
            epoch_loss = test_losses["loss"]
        else:
            epoch_loss = float(losses["loss"])

        lr = scheduler.step(epoch_loss)
        state = state._replace(
            main_opt_state=set_learning_rate(state.main_opt_state, lr)
        )
        print(
            f"Epoch {epoch} done in {time.time()-t0:.1f}s, "
            f"loss {epoch_loss:.4f}, lr {lr:g}"
        )

        if args.save and pidx == 0:
            # full train state every epoch (resume point) + best model export
            save_train_checkpoint(
                args.save_path + ".train", state, scheduler, epoch=epoch,
                key=key, best_loss=min(best_loss, epoch_loss),
                extra={"architecture": args.model, "lmbda": args.lmbda},
            )
            if epoch_loss < best_loss:
                best_loss = epoch_loss
                model.params = jax.device_get(state.params)
                save_checkpoint(model, args.save_path, architecture=args.model,
                                extra={"epoch": epoch, "lmbda": args.lmbda})
                print(f"Saved checkpoint to {args.save_path}")

    return state


if __name__ == "__main__":
    main()
