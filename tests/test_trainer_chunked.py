"""Chunked device-resident stepping must be step-for-step identical to the
per-dispatch path: the per-step PRNG key and EMA gate derive from
``state.step`` alone, so grouping steps into one lax.scan dispatch
(``make_chunked_resident_step``) may not change anything but wall time."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physicsinformeddiffusionmodels_tpu.training import (
    create_train_state,
    make_chunked_resident_step,
    make_device_resident_step,
    make_optimizer,
)
from physicsinformeddiffusionmodels_tpu.config import RunConfig


def _toy_setup():
    def loss_fn(params, batch, key, step):
        noise = jax.random.normal(key, batch.shape)
        pred = batch @ params["w"] + params["b"]
        loss = jnp.mean((pred - noise) ** 2)
        return loss, loss

    def make_params():
        # fresh buffers per run: the jitted steps donate the state
        key = jax.random.key(0)
        return {
            "w": jax.random.normal(key, (8, 8), jnp.float32) * 0.1,
            "b": jnp.zeros((8,), jnp.float32),
        }

    tx = make_optimizer(1e-3)
    data = jax.random.normal(jax.random.key(1), (32, 8), jnp.float32)
    return loss_fn, make_params, tx, data


@pytest.mark.parametrize("total,chunk", [(41, 20), (7, 4)])
def test_chunked_equals_per_step(total, chunk):
    loss_fn, make_params, tx, data = _toy_setup()
    base_key = jax.random.key(42)

    step1 = make_device_resident_step(loss_fn, tx, batch_size=4, ema_start=3)
    state_a = create_train_state(make_params(), tx)
    for _ in range(total):
        state_a, _ = step1(state_a, data, base_key)

    stepc = make_chunked_resident_step(loss_fn, tx, batch_size=4, chunk=chunk, ema_start=3)
    state_b = create_train_state(make_params(), tx)
    it = 0
    while it < total:
        if it % chunk == 1 and it + chunk <= total:
            state_b, _ = stepc(state_b, data, base_key)
            it += chunk
        else:
            state_b, _ = step1(state_b, data, base_key)
            it += 1

    assert int(state_a.step) == int(state_b.step) == total
    for name in ("params", "ema_params"):
        a = getattr(state_a, name)
        b = getattr(state_b, name)
        for ka in a:
            np.testing.assert_allclose(
                np.asarray(a[ka]), np.asarray(b[ka]), rtol=0, atol=1e-7,
                err_msg=f"{name}/{ka} diverged between chunked and per-step",
            )


def test_chunked_last_aux_matches_per_step():
    loss_fn, make_params, tx, data = _toy_setup()
    base_key = jax.random.key(7)
    step1 = make_device_resident_step(loss_fn, tx, batch_size=4)
    stepc = make_chunked_resident_step(loss_fn, tx, batch_size=4, chunk=5)

    state = create_train_state(make_params(), tx)
    auxes = []
    for _ in range(5):
        state, aux = step1(state, data, base_key)
        auxes.append(float(aux))

    state_c = create_train_state(make_params(), tx)
    state_c, aux_c = stepc(state_c, data, base_key)
    assert int(state_c.step) == 5
    np.testing.assert_allclose(float(aux_c), auxes[-1], rtol=1e-6)


def test_validate_chunking_rejects_misaligned_freqs():
    cfg = RunConfig(chunk_steps=20, test_eval_freq=510)
    with pytest.raises(ValueError, match="test_eval_freq"):
        cfg.validate_chunking()
    RunConfig(chunk_steps=20).validate_chunking()  # defaults align
