"""Training-loop parity: plateau LR scheduling and exact checkpoint resume.

The reference trains with Adam + ReduceLROnPlateau and checkpoints carry the
net, BOTH optimizers, and the scheduler (``examples/train.py:199-203,
327-338``). These tests pin (a) scheduler semantics against torch's actual
``ReduceLROnPlateau``, and (b) kill-and-resume reproducing the uninterrupted
loss trajectory bit-for-bit.
"""

import numpy as np
import pytest

import jax

from compressai_environment_tpu.models.google import FactorizedPriorNet
from compressai_environment_tpu.training import (
    PlateauScheduler,
    get_learning_rate,
    init_train_state,
    rate_distortion_loss,
    set_learning_rate,
    train_step,
)
from compressai_environment_tpu.utils.checkpoint import (
    load_train_checkpoint,
    save_train_checkpoint,
)


def test_plateau_scheduler_matches_torch(rng):
    torch = pytest.importorskip("torch")

    lr0 = 1e-2
    ours = PlateauScheduler(lr0, factor=0.5, patience=2)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=lr0)
    ref = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, "min", factor=0.5, patience=2
    )

    losses = rng.random(40) * 10
    losses[10:20] = 5.0  # plateau
    losses[25:] = 4.9999  # sub-threshold improvement: still a plateau
    for i, loss in enumerate(losses):
        our_lr = ours.step(float(loss))
        ref.step(float(loss))
        ref_lr = opt.param_groups[0]["lr"]
        assert our_lr == pytest.approx(ref_lr, rel=1e-12), f"step {i}"


def _make_setup(seed=0):
    net = FactorizedPriorNet(N=8, M=12)
    key = jax.random.key(seed)
    x0 = np.zeros((2, 32, 32, 3), np.float32)
    params = net.init({"params": key, "noise": jax.random.key(1)}, x0)["params"]
    state, txs = init_train_state(params, learning_rate=1e-3)
    return net, state, txs


def _batches(n, seed=7):
    r = np.random.default_rng(seed)
    return [r.random((2, 32, 32, 3), dtype=np.float32) for _ in range(n)]


def _run_steps(net, state, txs, batches, base_key, start=0):
    losses = []
    for i, b in enumerate(batches):
        key = jax.random.fold_in(base_key, start + i)
        state, out = train_step(net, state, txs, b, key, 0.01,
                                rate_distortion_loss)
        losses.append(float(out["loss"]))
    return state, losses


def test_kill_and_resume_reproduces_trajectory(tmp_path):
    net, state, txs = _make_setup()
    base_key = jax.random.key(42)
    batches = _batches(6)

    # uninterrupted run
    _, ref_losses = _run_steps(net, state, txs, batches, base_key)

    # interrupted: 3 steps, full checkpoint, fresh process-equivalent
    # restore, 3 more steps
    net2, state2, txs2 = _make_setup()
    state2, first = _run_steps(net2, state2, txs2, batches[:3], base_key)
    sched = PlateauScheduler(1e-3, patience=1)
    sched.step(first[-1])
    ckpt = tmp_path / "train.msgpack"
    save_train_checkpoint(ckpt, state2, sched, epoch=0, key=base_key,
                          best_loss=min(first))

    net3, template, txs3 = _make_setup(seed=0)
    sched3 = PlateauScheduler(1e-3, patience=1)
    state3, sched3, epoch, key3, best, _ = load_train_checkpoint(
        ckpt, template, sched3
    )
    assert epoch == 0
    assert best == pytest.approx(min(first))
    assert sched3.best == sched.best
    assert int(state3.step) == 3
    state3, rest = _run_steps(net3, state3, txs3, batches[3:], key3, start=3)

    np.testing.assert_array_equal(
        np.asarray(first + rest, np.float64), np.asarray(ref_losses, np.float64)
    )


def test_set_learning_rate_roundtrip():
    _, state, _ = _make_setup()
    assert get_learning_rate(state.main_opt_state) == pytest.approx(1e-3)
    new = set_learning_rate(state.main_opt_state, 1e-4)
    assert get_learning_rate(new) == pytest.approx(1e-4)
    # structure preserved: the optimizer still steps
    leaves_a = jax.tree_util.tree_structure(state.main_opt_state)
    leaves_b = jax.tree_util.tree_structure(new)
    assert leaves_a == leaves_b


def test_learning_rate_change_affects_updates():
    """A reduced LR must actually shrink parameter updates (the injected
    hyperparameter is live, not baked into the compiled step)."""
    net, state, txs = _make_setup()
    batch = _batches(1)[0]
    key = jax.random.key(0)

    s_hi, _ = train_step(net, state, txs, batch, key, 0.01, rate_distortion_loss)
    lo_state = state._replace(
        main_opt_state=set_learning_rate(state.main_opt_state, 1e-6)
    )
    s_lo, _ = train_step(net, lo_state, txs, batch, key, 0.01, rate_distortion_loss)

    d_hi = jax.tree_util.tree_map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                                  s_hi.params, state.params)
    d_lo = jax.tree_util.tree_map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                                  s_lo.params, state.params)
    hi = max(jax.tree_util.tree_leaves(
        {k: v for k, v in d_hi.items() if k != "entropy_bottleneck"}
    ))
    lo = max(jax.tree_util.tree_leaves(
        {k: v for k, v in d_lo.items() if k != "entropy_bottleneck"}
    ))
    assert lo < hi * 1e-2


def test_seeded_training_log_regression():
    """Numeric regression of a seeded short training run against a golden
    loss trajectory (reference ``tests/test_train.py:40-88`` compares a
    10-epoch seeded train log within tolerance), including the held-out
    eval losses the LR plateau steps on (reference
    ``examples/train.py:327-330``). GENERATE_EXPECTED=1 rewrites the
    fixture."""
    import json
    import os
    from pathlib import Path

    from compressai_environment_tpu.training import eval_step

    fixture = Path(__file__).parent / "expected" / "train_log_seeded.json"
    generate = os.environ.get("GENERATE_EXPECTED") == "1"

    net, state, txs = _make_setup(seed=5)
    base_key = jax.random.key(99)
    batches = _batches(8, seed=13)
    test_batch = _batches(1, seed=31)[0]
    losses, test_losses = [], []
    for i, b in enumerate(batches):
        key = jax.random.fold_in(base_key, i)
        state, out = train_step(net, state, txs, b, key, 0.01,
                                rate_distortion_loss)
        losses.append(float(out["loss"]))
        test_losses.append(float(eval_step(
            net, state.params, test_batch, 0.01, rate_distortion_loss
        )["loss"]))

    if generate or not fixture.exists():
        fixture.write_text(json.dumps(
            {"losses": losses, "test_losses": test_losses}
        ))
        if generate:
            pytest.skip("generated fixture")
    expected = json.loads(fixture.read_text())
    np.testing.assert_allclose(losses, expected["losses"], rtol=1e-4)
    np.testing.assert_allclose(test_losses, expected["test_losses"], rtol=1e-4)
