"""Train a real zoo checkpoint (factorized / hyperprior / mbt2018-mean) on
synthetic content.

Retires the bench's rate-calibration hack (VERDICT r2 missing #1): instead
of rescaling a random-init latent and baking empirical CDFs, train the
q5-config model (N=128, M=192, lambda=0.025 — docs/source/zoo.rst:64-69) to
convergence on a procedurally generated image distribution, bake the CDF
tables with the standard ``update(force=True)`` pipeline, and commit the
checkpoint. ``bench.py`` then measures at the trained operating point and
``tests/test_trained_checkpoint.py`` pins its RD numbers against the
reference implementation running the same weights.

The content family mixes smooth multi-scale fields with broadband texture
so the latent entropy lands in the published operating range (~0.3-1.5 bpp)
rather than at the degenerate extremes of pure noise / pure flat fields.
All randomness is seeded; the bench and the golden test draw held-out
images from the same family with disjoint seeds.

Run: ``python tools/train_synth.py --steps 4000``  (TPU, ~5 min with warm
compile cache; CPU works but is slow).
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def synth_image(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """One synthetic RGB image in [0,1], float32 (h, w, 3)."""
    img = np.zeros((h, w, 3), np.float32)
    for scale, amp in ((64, 0.6), (16, 0.3), (8, 0.15), (4, 0.08)):
        gh, gw = -(-h // scale), -(-w // scale)
        base = rng.standard_normal((gh, gw, 3)).astype(np.float32)
        up = np.kron(base, np.ones((scale, scale, 1), np.float32))[:h, :w]
        img += amp * up
    img += 0.03 * rng.standard_normal((h, w, 3)).astype(np.float32)
    lo, hi = np.percentile(img, [1, 99])
    return np.clip((img - lo) / max(hi - lo, 1e-6), 0.0, 1.0)


def synth_batch(seed: int, n: int, h: int, w: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return np.stack([synth_image(rng, h, w) for _ in range(n)])


def make_model(arch: str):
    """q5-config constructors (zoo cfgs, docs/source/zoo.rst:64-69)."""
    from compressai_environment_tpu.models import (
        Cheng2020Anchor,
        FactorizedPrior,
        JointAutoregressiveHierarchicalPriors,
        MeanScaleHyperprior,
        ScaleHyperprior,
    )

    return {
        "bmshj2018-factorized": lambda: FactorizedPrior(128, 192),
        "bmshj2018-hyperprior": lambda: ScaleHyperprior(128, 192),
        "mbt2018-mean": lambda: MeanScaleHyperprior(128, 192),
        "mbt2018": lambda: JointAutoregressiveHierarchicalPriors(192, 192),
        "cheng2020-anchor": lambda: Cheng2020Anchor(128),
    }[arch]()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="bmshj2018-factorized",
                   choices=["bmshj2018-factorized", "bmshj2018-hyperprior",
                            "mbt2018-mean", "mbt2018", "cheng2020-anchor"])
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--patch", type=int, default=256)
    p.add_argument("--lambda", dest="lmbda", type=float, default=0.025)
    p.add_argument("--lr", type=float, default=1e-4)
    # the aux (quantile-fit) loss moves ~lr per Adam step and the tail
    # quantiles start tens of units from their targets; the reference's
    # 1e-3 over 1-2M steps is far too slow for a short synthetic run
    p.add_argument("--aux-lr", type=float, default=1e-2)
    p.add_argument("--n-train", type=int, default=512)
    p.add_argument("--n-eval", type=int, default=32)
    p.add_argument("--eval-every", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    p.add_argument("--save-every", type=int, default=0,
                   help="also bake+save the checkpoint every N steps "
                        "(long runs survive interruption)")
    p.add_argument("--init-from", default=None,
                   help="warm-start params from an existing checkpoint "
                        "(fine-tune at a different lambda: the multi-"
                        "quality sweep converges far faster than from "
                        "scratch)")
    args = p.parse_args(argv)
    if args.out is None:
        args.out = f"checkpoints/{args.arch}-synth-q5.msgpack"

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from compressai_environment_tpu.training import (
        PlateauScheduler,
        eval_step,
        init_train_state,
        rate_distortion_loss,
        set_learning_rate,
        train_step,
    )
    from compressai_environment_tpu.utils.checkpoint import save_checkpoint

    model = make_model(args.arch).init(
        key=jax.random.key(args.seed), input_shape=(1, args.patch, args.patch, 3)
    )
    if args.init_from:
        from compressai_environment_tpu.utils.checkpoint import restore_into

        restore_into(model, args.init_from)
        print(f"warm-started from {args.init_from}", flush=True)
    state, txs = init_train_state(
        model.params, learning_rate=args.lr,
        aux_learning_rate=args.aux_lr, max_grad_norm=1.0,
    )
    scheduler = PlateauScheduler(args.lr, patience=5)

    print(f"generating {args.n_train}+{args.n_eval} synthetic patches ...")
    t0 = time.time()
    train_np = synth_batch(args.seed + 1, args.n_train, args.patch, args.patch)
    eval_np = synth_batch(args.seed + 2, args.n_eval, args.patch, args.patch)
    # whole dataset device-resident as uint8; per-step batches are device
    # gathers, so the host loop only samples indices
    train_dev = jnp.asarray((train_np * 255).round().astype(np.uint8))
    eval_dev = jnp.asarray(eval_np)
    print(f"  done in {time.time()-t0:.1f}s")

    net = model.net

    @jax.jit
    def step_fn(st, idx, key):
        batch = train_dev[idx].astype(jnp.float32) / 255.0
        return train_step(net, st, txs, batch, key, args.lmbda,
                          rate_distortion_loss)

    # the eval batch MUST be a jit argument, not a closure constant: on the
    # TPU backend XLA constant-folds closed-over float operands through the
    # conv pipeline with degraded numerics (measured mse 0.00081 -> 0.081
    # on cheng2020), silently corrupting the plateau scheduler's signal
    eval_fn = jax.jit(
        lambda prm, ev: eval_step(net, prm, ev, args.lmbda,
                                  rate_distortion_loss)
    )

    def bake_and_save(params, step_no):
        model.params = jax.device_get(params)
        model.update(force=True)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        save_checkpoint(
            model, args.out, architecture=args.arch,
            extra={"lmbda": args.lmbda, "steps": step_no, "seed": args.seed,
                   "train": "synthetic-v1"},
        )
        print(f"  [saved {args.out} @ step {step_no}]", flush=True)

    rng = np.random.default_rng(args.seed + 3)
    key = jax.random.key(args.seed + 4)
    best = float("inf")
    t0 = time.time()
    for i in range(args.steps):
        idx = jnp.asarray(rng.integers(0, args.n_train, args.batch_size))
        key, sub = jax.random.split(key)
        state, losses = step_fn(state, idx, sub)
        if args.save_every and (i + 1) % args.save_every == 0 and i + 1 < args.steps:
            bake_and_save(state.params, i + 1)
        if (i + 1) % args.eval_every == 0 or i == 0:
            ev = {k: float(v)
                  for k, v in eval_fn(state.params, eval_dev).items()}
            lr = scheduler.step(ev["loss"])
            state = state._replace(
                main_opt_state=set_learning_rate(state.main_opt_state, lr)
            )
            rate = (i + 1) / (time.time() - t0)
            print(
                f"step {i+1:5d} | eval loss {ev['loss']:.4f} "
                f"bpp {ev['bpp_loss']:.3f} mse {ev['mse_loss']:.5f} "
                f"aux {ev['aux_loss']:.1f} | lr {lr:g} | {rate:.1f} it/s"
            )
            best = min(best, ev["loss"])

    model.params = jax.device_get(state.params)
    model.update(force=True)

    # measured real-coded bpp on held-out content (honesty check vs the
    # entropy-estimated bpp_loss)
    model.stream_format = "tpu"
    c = model.compress(eval_np[:8])
    bpp = sum(
        len(s) for ss in c["strings"] for s in ss
    ) * 8 / (8 * args.patch * args.patch)
    print(f"coded bpp on held-out: {bpp:.4f}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_checkpoint(
        model, args.out, architecture=args.arch,
        extra={"lmbda": args.lmbda, "steps": args.steps, "seed": args.seed,
               "train": "synthetic-v1", "coded_bpp_heldout": round(bpp, 4)},
    )
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
