"""Opt-in cosine lr decay (`make_optimizer(schedule='cosine')`).

The default is the reference's constant-lr Adam recipe (`main.py:143,165`);
cosine is the documented lever against the measured late-training
sampled-residual degradation (results/darcy_300k). These tests pin that the
schedule actually shrinks the applied update magnitude over the horizon and
that 'constant' is bit-identical to the pre-schedule optimizer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from physicsinformeddiffusionmodels_tpu.training import make_optimizer


def _update_norm(tx, n_warm_steps):
    params = {"w": jnp.ones((4,), jnp.float32)}
    grads = {"w": jnp.full((4,), 0.5, jnp.float32)}
    state = tx.init(params)
    for _ in range(n_warm_steps):
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    updates, _ = tx.update(grads, state, params)
    return float(jnp.linalg.norm(updates["w"]))


def test_cosine_shrinks_late_updates():
    tx = make_optimizer(1e-2, schedule="cosine", total_steps=100, final_frac=0.1)
    early, late = _update_norm(tx, 0), _update_norm(tx, 99)
    # with constant grads Adam's step magnitude ~ lr; cosine ends at 0.1*lr
    assert late < 0.25 * early
    np.testing.assert_allclose(late / early, 0.1, rtol=0.25)


def test_constant_matches_default_recipe():
    tx_a = make_optimizer(1e-3)
    tx_b = make_optimizer(1e-3, schedule="constant", total_steps=12345)
    assert _update_norm(tx_a, 5) == _update_norm(tx_b, 5)


def test_cosine_requires_horizon():
    with pytest.raises(ValueError, match="total_steps"):
        make_optimizer(1e-3, schedule="cosine", total_steps=0)
    with pytest.raises(ValueError, match="schedule"):
        make_optimizer(1e-3, schedule="linear")


def test_train_cli_accepts_lr_schedule(tmp_path, monkeypatch):
    # flag plumbs through RunConfig without touching the default recipe
    import train as train_mod

    cfg_holder = {}
    monkeypatch.setattr(
        train_mod, "run_darcy", lambda cfg: cfg_holder.setdefault("cfg", cfg)
    )
    train_mod.main(
        ["--gov-eqs", "darcy", "--lr-schedule", "cosine",
         "--lr-final-frac", "0.05", "--iterations", "10"]
    )
    cfg = cfg_holder["cfg"]
    assert cfg.lr_schedule == "cosine" and cfg.lr_final_frac == 0.05
    cfg_holder.clear()
    train_mod.main(["--gov-eqs", "darcy", "--iterations", "10"])
    assert cfg_holder["cfg"].lr_schedule == "constant"
