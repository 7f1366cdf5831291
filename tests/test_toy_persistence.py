"""Toy-run persistence: constraint spec round-trip + guidance guard.

The reference dill-pickles the user-pluggable residual/inequality/
optimization modules with the toy checkpoint and restores them at load
(`/root/reference/src/denoising_toy_utils.py:527-592`). Here the same
capability is a serialized SPEC (registry name + kwargs) rebuilt at load —
these tests do the full save -> load -> sample round trip, including a
custom user-registered constraint.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physicsinformeddiffusionmodels_tpu.config import RunConfig
from physicsinformeddiffusionmodels_tpu.diffusion import p_sample_loop
from physicsinformeddiffusionmodels_tpu.diffusion.losses import PhysicsTerms
from physicsinformeddiffusionmodels_tpu.physics.toy import (
    build_toy_constraint,
    hypersphere_residual,
    register_toy_constraint,
    toy_physics,
)
from physicsinformeddiffusionmodels_tpu.training import save_checkpoint


def test_guidance_guard_non_darcy():
    """Reference parity: `main.py:47-48` refuses residual_grad_guidance for
    non-Darcy studies instead of silently ignoring it."""
    with pytest.raises(ValueError, match="residual_grad_guidance"):
        RunConfig(gov_eqs="mechanics", residual_grad_guidance=True)
    # darcy still accepts it
    RunConfig(gov_eqs="darcy", residual_grad_guidance=True)


def test_build_toy_constraint_defaults_and_errors():
    fn = build_toy_constraint(None)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 2)), jnp.float32)
    ref = toy_physics(x)
    got = fn(x)
    np.testing.assert_allclose(np.asarray(got.residual), np.asarray(ref.residual))
    with pytest.raises(KeyError, match="unknown toy constraint"):
        build_toy_constraint({"name": "nope", "kwargs": {}})


def test_toy_save_load_sample_roundtrip(tmp_path):
    """Train a step with a CUSTOM registered constraint, save, reload via
    load_toy_run, and check (a) the constraint came back from its spec,
    (b) params round-tripped exactly, (c) sampling runs on the restored
    model (the reference's load_model -> p_sample flow)."""
    import train_toy

    @register_toy_constraint("scaled_hypersphere")
    def _scaled(radius: float = 1.0):
        def physics_fn(x0_pred):
            return PhysicsTerms(
                residual=jnp.sum(x0_pred**2, axis=1) - radius**2,
                inequality=jnp.zeros(x0_pred.shape[0]),
                optimizer=jnp.zeros(x0_pred.shape[0]),
            )

        return physics_fn

    config = train_toy.default_config()
    config["train_num_steps"] = 1
    config["constraint_spec"] = {"name": "scaled_hypersphere", "kwargs": {"radius": 2.0}}

    from physicsinformeddiffusionmodels_tpu.diffusion import create_schedule
    from physicsinformeddiffusionmodels_tpu.models.toy import ConditionalModel
    from physicsinformeddiffusionmodels_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    sched = create_schedule(config["n_steps"])
    model = ConditionalModel(dim=config["dim"], n_steps=config["n_steps"])
    params = model.init(
        jax.random.key(0), jnp.zeros((1, config["dim"])), jnp.zeros((1,), jnp.int32)
    )
    tx = make_optimizer(config["lr"])
    state = create_train_state(params, tx)
    train_step = make_train_step(
        train_toy.build_loss_fn(model, sched, config), tx, ema_start=10**9
    )
    batch = jnp.asarray(
        np.random.default_rng(1).normal(size=(16, config["dim"])), jnp.float32
    )
    state, aux = train_step(state, batch, jax.random.key(1))
    assert np.isfinite(float(aux.loss))

    out_dir = tmp_path / "toy_run"
    save_checkpoint(
        out_dir / "model", 1,
        params=state.params, ema_params=state.ema_params,
        opt_state=state.opt_state, config=config,
    )

    model2, params2, sched2, config2, physics_fn2 = train_toy.load_toy_run(out_dir)
    # (a) the custom constraint is rebuilt from its spec
    assert config2["constraint_spec"]["name"] == "scaled_hypersphere"
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 2)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(physics_fn2(x).residual),
        np.asarray(jnp.sum(x**2, axis=1) - 4.0),
        rtol=1e-6,
    )
    # (b) params round-trip exactly
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # (c) sampling runs on the restored model
    result = p_sample_loop(
        sched2,
        lambda x, t: model2.apply(params2, x, t),
        (8, config2["dim"]),
        jax.random.key(3),
        pred_mode=config2["model_pred_mode"],
        suppress_noise=True,
    )
    final = np.asarray(result.x)
    assert final.shape == (8, config2["dim"])
    assert np.isfinite(final).all()
    assert np.isfinite(np.asarray(hypersphere_residual(result.x))).all()
