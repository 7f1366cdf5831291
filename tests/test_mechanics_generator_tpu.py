"""TPU-batched SIMP generator vs the host sparse-LU generator.

Both optimize the same scenarios; the device path must reproduce the host
designs (same SIMP/OC/filter math, CG instead of LU inside the loop) and
the emitted dataset must satisfy the reference's load-time invariant
K(E) u - f ~= 0 (`residuals_mechanics_K.py:303-305`) because the final
channel build shares the host's exact solve (``fields_from_design``).
"""

import numpy as np
import pytest

from physicsinformeddiffusionmodels_tpu.data.mechanics_generator import (
    SCENARIO_FAMILIES,
    MechanicsFEM,
    simp_topopt,
)
from physicsinformeddiffusionmodels_tpu.data.mechanics_generator_tpu import (
    TpuSimpGenerator,
    generate_dataset_tpu,
)
from physicsinformeddiffusionmodels_tpu.physics.mechanics import (
    MechanicsResidual,
    split_mechanics_batch,
)

import jax.numpy as jnp

P = 16


@pytest.fixture(scope="module")
def scenarios():
    fem = MechanicsFEM(P)
    rng = np.random.default_rng(21)
    fixed = np.zeros((3, fem.neq), bool)
    f = np.zeros((3, fem.neq))
    for b, fam in enumerate(["cantilever", "bridge", "double_clamp"]):
        fixed[b], f[b] = SCENARIO_FAMILIES[fam](fem, rng)
    vf = np.array([0.4, 0.5, 0.35])
    return fem, fixed, f, vf


def test_device_simp_matches_host_designs(scenarios):
    """Same scenario + vf -> device and host SIMP land on (near-)identical
    designs; the only difference is the inner linear solver (f32 warm-start
    PCG vs f64 LU)."""
    fem, fixed, f, vf = scenarios
    n_iter = 12
    gen = TpuSimpGenerator(P, n_iter=n_iter, cg_tol=1e-8, cg_maxiter=3000)
    scen = gen.scenarios_from_host(fixed, f, vf)
    rho_dev, relres = gen.optimize(scen)
    rho_dev = np.asarray(rho_dev)
    assert np.all(np.asarray(relres) < 1e-3)

    for b in range(3):
        rho_host = simp_topopt(fem, float(vf[b]), f[b], fixed[b], n_iter=n_iter)
        # volume constraints active and equal
        assert rho_dev[b].mean() == pytest.approx(float(vf[b]), abs=2e-3)
        assert rho_host.mean() == pytest.approx(float(vf[b]), abs=2e-3)
        # designs agree pointwise (small drift from the f32 inner solves)
        assert np.abs(rho_dev[b] - rho_host).mean() < 0.01
        # binarized layouts agree almost everywhere
        agree = np.mean((rho_dev[b] > 0.5) == (rho_host > 0.5))
        assert agree > 0.97


def test_generate_dataset_tpu_invariant_and_layout(tmp_path):
    """End-to-end batch: output layout, channel semantics, and the
    K u - f ~= 0 dataset invariant evaluated by the TRAINING residual."""
    n = 4
    samples = generate_dataset_tpu(
        n, nels_per_side=P, seed=5, out_dir=str(tmp_path), batch=4,
        n_iter=8, families=("cantilever", "bridge"),
    )
    assert samples.shape == (n, P + 1, P + 1, 10)
    assert sorted(p.name for p in tmp_path.glob("*.npy")) == [
        f"{i}.npy" for i in range(n)
    ]

    mech = MechanicsResidual(pixels_per_dim=P)
    mb = split_mechanics_batch(jnp.asarray(samples))
    rho_e = mb.solution[..., 2][:, :-1, :-1].reshape(n, -1)
    # E field channel is rho^penal-scaled; invariant uses it directly
    residual, u, fv, mask = mech.residual_from_fields(
        mb.solution[..., :2], rho_e, mb.bcs
    )
    r = np.asarray(residual)
    fn = np.linalg.norm(np.asarray(fv), axis=1)
    rel = np.linalg.norm(r, axis=1) / np.maximum(fn, 1e-30)
    assert np.all(rel < 1e-4), rel

    # displacements normalized to max |u| = 1
    disp = np.asarray(mb.solution[..., :2])
    np.testing.assert_allclose(
        np.abs(disp).reshape(n, -1).max(axis=1), 1.0, rtol=1e-5
    )
    # vf conditioning channel equals the achieved E-field mean
    vf_chan = np.asarray(mb.conditioning[..., 0][:, 0, 0])
    e_mean = np.asarray(mb.solution[..., 2][:, :-1, :-1].mean(axis=(1, 2)))
    np.testing.assert_allclose(vf_chan, e_mean, rtol=1e-5)


def test_ood_families_differ_from_cantilever():
    """The OOD scenario families produce support/load patterns disjoint from
    the training family (this is what makes test_level_2 out-of-distribution)."""
    fem = MechanicsFEM(P)
    rng = np.random.default_rng(3)
    fixed_c, f_c = SCENARIO_FAMILIES["cantilever"](fem, rng)
    for fam in ("bridge", "double_clamp"):
        fixed_o, f_o = SCENARIO_FAMILIES[fam](fem, rng)
        assert not np.array_equal(fixed_o, fixed_c)
    # multiload: same supports, more loaded nodes
    fixed_m, f_m = SCENARIO_FAMILIES["cantilever_multiload"](fem, rng)
    assert np.array_equal(fixed_m, fixed_c)
    assert np.count_nonzero(f_m) > np.count_nonzero(f_c)
