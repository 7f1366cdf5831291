"""Multislice mesh axis (SURVEY §2.5): DP across TPU slices over DCN.

On this host the 'slice' axis is exercised symbolically over 8 virtual CPU
devices — the sharding/collective program is identical to a real multislice
job (GSPMD inserts the cross-slice gradient all-reduce); only the physical
transport differs. Parity tests pin that the (slice, dp, tp) mesh computes
the same numbers as a single device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physicsinformeddiffusionmodels_tpu.parallel import (
    data_axes,
    make_mesh,
    shard_batch,
    shard_params,
)


@pytest.fixture(scope="module")
def devices():
    d = jax.devices()
    if len(d) < 8:
        pytest.skip("needs 8 virtual devices")
    return d


def test_mesh_shape_and_axes(devices):
    mesh = make_mesh(tp=2, n_slices=2, devices=devices[:8])
    assert dict(mesh.shape) == {"slice": 2, "dp": 2, "tp": 2}
    assert data_axes(mesh) == ("slice", "dp")
    assert data_axes(make_mesh(devices=devices[:8])) == ("dp",)
    with pytest.raises(ValueError):
        make_mesh(tp=1, n_slices=3, devices=devices[:8])
    with pytest.raises(ValueError):
        make_mesh(dp=3, tp=1, n_slices=2, devices=devices[:8])


def test_batch_split_over_slice_and_dp(devices):
    mesh = make_mesh(tp=2, n_slices=2, devices=devices[:8])
    x = jnp.arange(8 * 3, dtype=jnp.float32).reshape(8, 3)
    xs = shard_batch(x, mesh)
    # slice*dp = 4 data shards of 2 rows each, replicated over tp
    assert {s.data.shape for s in xs.addressable_shards} == {(2, 3)}
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_train_step_matches_single_device(devices):
    """Full train step (loss + grads + Adam + EMA) on the (slice, dp, tp)
    mesh reproduces the single-device numbers."""
    from physicsinformeddiffusionmodels_tpu.diffusion import (
        LossWeights,
        create_schedule,
        pidm_loss,
        uniform_timesteps,
    )
    from physicsinformeddiffusionmodels_tpu.models.unet import UNet
    from physicsinformeddiffusionmodels_tpu.physics.darcy import DarcyResidual
    from physicsinformeddiffusionmodels_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    pixels, batch = 16, 8
    sched = create_schedule(100)
    physics = DarcyResidual(pixels_per_dim=pixels)
    model = UNet(dim=8, dim_mults=(1, 2), channels=2)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, pixels, pixels, 2)), jnp.zeros((1,), jnp.int32)
    )
    tx = make_optimizer(1e-4)

    def loss_fn(p, bx, k, step):
        t_key, n_key = jax.random.split(k)
        t = uniform_timesteps(t_key, bx.shape[0], 100)
        return pidm_loss(
            sched, bx, t, n_key,
            denoise_fn=lambda x, tt: model.apply(p, x, tt),
            physics_fn=physics,
            weights=LossWeights(c_data=1.0, c_residual=1e-3),
        )

    step_fn = make_train_step(loss_fn, tx, donate=False)
    x = jax.random.normal(jax.random.key(1), (batch, pixels, pixels, 2))
    k = jax.random.key(2)

    # single device
    s0 = create_train_state(params, tx)
    s0, aux0 = step_fn(s0, x, k)

    # (slice=2, dp=2, tp=2) mesh
    mesh = make_mesh(tp=2, n_slices=2, devices=devices[:8])
    sp = shard_params(params, mesh)
    sm = create_train_state(sp, tx)
    xm = shard_batch(x, mesh)
    with mesh:
        sm, auxm = step_fn(sm, xm, k)

    np.testing.assert_allclose(
        float(aux0.loss), float(auxm.loss), rtol=2e-5, atol=1e-6
    )
    l0 = jax.tree.leaves(s0.params)[0]
    lm = jax.tree.leaves(sm.params)[0]
    np.testing.assert_allclose(np.asarray(l0), np.asarray(lm), rtol=2e-4, atol=2e-6)
