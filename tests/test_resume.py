"""Checkpoint/resume round-trip.

VERDICT r1 item 5: a preempted run restored via ``restore_train_state``
must land on exactly the state an uninterrupted run reaches — params, EMA,
optimizer moments and the per-step PRNG stream (which folds in
``state.step``) all have to line up. Mirrors the drivers' loop semantics
(`train.py:252-318`): checkpoints are labeled with the loop iteration and
saved *after* that iteration's update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physicsinformeddiffusionmodels_tpu.training import (
    create_train_state,
    make_optimizer,
    make_train_step,
    restore_train_state,
    save_checkpoint,
)


def _loss_fn(params, batch, key, step):
    noise = jax.random.normal(key, batch.shape)
    pred = batch @ params["w"] + params["b"]
    loss = jnp.mean((pred - noise) ** 2)
    return loss, loss


@pytest.fixture
def setup():
    params = {
        "w": jnp.eye(4) * 0.5,
        "b": jnp.zeros((4,)),
    }
    tx = make_optimizer(1e-2, 1.0)
    step = make_train_step(_loss_fn, tx, ema_mu=0.5, ema_start=2, donate=False)
    batches = np.random.default_rng(0).normal(size=(8, 16, 4)).astype(np.float32)
    return params, tx, step, batches


def _run(state, step_fn, batches, base_key, start, stop):
    for it in range(start, stop):
        state, _ = step_fn(state, jnp.asarray(batches[it]), base_key)
    return state


def test_resume_reproduces_uninterrupted_run(setup, tmp_path):
    params, tx, step_fn, batches = setup
    base_key = jax.random.key(7)

    # uninterrupted: iterations 0..7
    ref = _run(create_train_state(params, tx), step_fn, batches, base_key, 0, 8)

    # interrupted: run 0..4 (5 iterations), checkpoint labeled it=4, restart
    part = _run(create_train_state(params, tx), step_fn, batches, base_key, 0, 5)
    save_checkpoint(
        tmp_path, 4,
        params=part.params, ema_params=part.ema_params, opt_state=part.opt_state,
    )

    fresh = create_train_state(params, tx)
    restored, start_it = restore_train_state(tmp_path, fresh)
    assert start_it == 5
    assert int(restored.step) == 5
    resumed = _run(restored, step_fn, batches, base_key, start_it, 8)

    for name, a, b in [
        ("params", ref.params, resumed.params),
        ("ema", ref.ema_params, resumed.ema_params),
    ]:
        flat_a = jax.tree_util.tree_leaves(a)
        flat_b = jax.tree_util.tree_leaves(b)
        for x, y in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=name)
    assert int(ref.step) == int(resumed.step)
    # optimizer moments restored too
    for x, y in zip(
        jax.tree_util.tree_leaves(ref.opt_state),
        jax.tree_util.tree_leaves(resumed.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_restore_without_checkpoint_is_noop(setup, tmp_path):
    params, tx, _, _ = setup
    state = create_train_state(params, tx)
    restored, start = restore_train_state(tmp_path / "empty", state)
    assert start == 0
    assert restored is state


def test_resume_from_slim_checkpoint_falls_back_to_fresh_opt(setup, tmp_path):
    """The drivers' intermediate dump saves omit optimizer state (the Adam
    moments double a dim=128 checkpoint to 2.1 GB and the device->host pull
    over a tunneled chip costs ~380 s). Resuming from such a slim
    checkpoint must restore params/EMA/step and keep the template's fresh
    optimizer state rather than erroring or restoring garbage."""
    params, tx, step_fn, batches = setup
    base_key = jax.random.key(7)

    part = _run(create_train_state(params, tx), step_fn, batches, base_key, 0, 5)
    save_checkpoint(
        tmp_path, 4,
        params=part.params, ema_params=part.ema_params, opt_state=None,
    )

    fresh = create_train_state(params, tx)
    restored, start_it = restore_train_state(tmp_path, fresh)
    assert start_it == 5
    for x, y in zip(
        jax.tree_util.tree_leaves(part.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(
        jax.tree_util.tree_leaves(part.ema_params),
        jax.tree_util.tree_leaves(restored.ema_params),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # optimizer state is the fresh template's (not the part-run's moments)
    for x, y in zip(
        jax.tree_util.tree_leaves(fresh.opt_state),
        jax.tree_util.tree_leaves(restored.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
