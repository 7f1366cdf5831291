"""Mechanics physics layer: element stiffness properties, matrix-free
residual vs sparse FEM oracle, topopt metrics, connected components."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physicsinformeddiffusionmodels_tpu.data.mechanics_generator import (
    MechanicsFEM,
    generate_dataset,
    simp_topopt,
)
from physicsinformeddiffusionmodels_tpu.ops.connected_components import (
    count_components,
    count_components_numpy,
    floating_material,
)
from physicsinformeddiffusionmodels_tpu.physics.mechanics import (
    MechanicsResidual,
    quad4_stiffness,
    split_mechanics_batch,
)

P = 8  # elements per side for fast tests; code is size-generic


@pytest.fixture(scope="module")
def mech():
    return MechanicsResidual(pixels_per_dim=P)


@pytest.fixture(scope="module")
def dataset():
    return generate_dataset(2, nels_per_side=P, seed=3)


def test_quad4_stiffness_properties():
    K = quad4_stiffness(1.0, 0.3)
    np.testing.assert_allclose(K, K.T, atol=1e-12)
    evals = np.linalg.eigvalsh(K)
    # exactly 3 rigid-body modes (2 translations + 1 rotation)
    assert (np.abs(evals) < 1e-10).sum() == 3
    assert (evals > -1e-10).all()
    # plane-stress unit square, E=1, nu=0.3: K[0,0] = (1/2 - nu/6)/(1-nu^2)
    assert K[0, 0] == pytest.approx((0.5 - 0.3 / 6) / (1 - 0.09), rel=1e-12)


def test_quad4_patch_test():
    """Uniform strain field: f = K u must equal the consistent nodal forces
    of a constant stress state (rigid translations produce zero force)."""
    K = quad4_stiffness()
    u_rigid = np.tile([1.0, 0.0], 4)
    np.testing.assert_allclose(K @ u_rigid, 0.0, atol=1e-12)
    u_rigid_y = np.tile([0.0, 1.0], 4)
    np.testing.assert_allclose(K @ u_rigid_y, 0.0, atol=1e-12)


def test_residual_zero_on_fem_solution(mech, dataset):
    """Matrix-free residual vanishes on the sparse-FEM oracle solution —
    the invariant the reference asserts on its dataset
    (`residuals_mechanics_K.py:303-305`)."""
    batch = split_mechanics_batch(jnp.asarray(dataset))
    rho = batch.solution[:, :-1, :-1, 2].reshape(len(dataset), -1)
    res, u, f, mask = mech.residual_from_fields(
        batch.solution[..., :2], rho, batch.bcs
    )
    assert np.abs(np.asarray(res)).mean() < 1e-5


def test_residual_matches_dense_assembly(mech, dataset):
    """Matrix-free K u equals dense-assembled K @ u."""
    batch = split_mechanics_batch(jnp.asarray(dataset))
    rho = batch.solution[:, :-1, :-1, 2].reshape(len(dataset), -1)
    u = mech.displacements_to_dofs(batch.solution[..., :2])
    f, mask = mech._bc_data(batch.bcs)
    K = mech.assemble_dense(rho, mask)
    dense_r = jnp.einsum("bij,bj->bi", K, u) - f
    res, *_ = mech.residual_from_fields(batch.solution[..., :2], rho, batch.bcs)
    np.testing.assert_allclose(np.asarray(res), np.asarray(dense_r), atol=1e-4)


def test_residual_nonzero_on_perturbed(mech, dataset):
    batch = split_mechanics_batch(jnp.asarray(dataset))
    rho = batch.solution[:, :-1, :-1, 2].reshape(len(dataset), -1)
    disp = batch.solution[..., :2] + 0.5
    # NOTE: +0.5 shifts masked dofs too -> residual = u there
    res, *_ = mech.residual_from_fields(disp, rho, batch.bcs)
    assert np.abs(np.asarray(res)).mean() > 1e-3


def test_compliance_positive(mech, dataset):
    batch = split_mechanics_batch(jnp.asarray(dataset))
    rho = batch.solution[:, :-1, :-1, 2].reshape(len(dataset), -1)
    u = mech.displacements_to_dofs(batch.solution[..., :2])
    _, mask = mech._bc_data(batch.bcs)
    c = np.asarray(mech.compliance(u, rho, mask))
    assert (c > 0).all()
    # compliance == u^T f on the solution (energy balance)
    f, _ = mech._bc_data(batch.bcs)
    uf = np.asarray(jnp.einsum("bi,bi->b", u, f))
    np.testing.assert_allclose(c, uf, rtol=1e-3)


def test_evaluate_terms_and_gradients(mech, dataset):
    """evaluate() is differentiable end-to-end w.r.t. the model output."""
    batch = split_mechanics_batch(jnp.asarray(dataset))
    vf = batch.conditioning[..., 0][:, 0, 0]
    x0 = jax.random.normal(jax.random.key(0), (len(dataset), P, P, 3)) * 0.1 + 0.4

    def loss(x0):
        terms = mech.evaluate(x0, batch.bcs, vf)
        return (
            jnp.abs(terms.residual).mean()
            + terms.optimizer.mean()
            + terms.inequality.mean()
        )

    g = jax.grad(loss)(x0)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_topopt_eval_on_ground_truth(mech, dataset):
    """Feeding the dataset's own optimum as the 'prediction': data residual
    ~0; rel_CE close to the binarized-design compliance ratio; vf_error
    finite."""
    from physicsinformeddiffusionmodels_tpu.ops.reshape import resize_bilinear

    batch = split_mechanics_batch(jnp.asarray(dataset))
    disp64 = resize_bilinear(batch.solution[..., :2], P)
    rho64 = batch.solution[:, :-1, :-1, 2:3]
    x0_pred = jnp.concatenate([disp64, rho64], axis=-1)
    out = mech.topopt_eval(x0_pred, batch)
    assert float(out["data_residual_mean_abs"]) < 1e-5
    assert np.isfinite(np.asarray(out["rel_CE_error_full_batch"])).all()
    assert np.isfinite(np.asarray(out["vf_error_full_batch"])).all()
    fm = floating_material(np.asarray(out["rho_binarized"]))
    assert fm.shape == (len(dataset),)


def test_connected_components():
    img = np.zeros((10, 10), np.float32)
    img[1:4, 1:4] = 1.0
    assert count_components(img) == 1
    img[6:9, 6:9] = 1.0
    assert count_components(img) == 2
    # diagonal touch merges under 8-connectivity (cv2 default)
    img2 = np.zeros((4, 4), np.float32)
    img2[0, 0] = img2[1, 1] = 1.0
    assert count_components(img2) == 1
    # native and numpy agree on random fields
    rng = np.random.default_rng(0)
    for _ in range(5):
        r = (rng.random((16, 16)) > 0.6).astype(np.float32)
        assert count_components(r) == count_components_numpy(r)


def test_floating_material_flags():
    solid = np.ones((1, 8, 8), np.float32)
    assert floating_material(solid)[0] == 0
    two = np.zeros((1, 8, 8), np.float32)
    two[0, 0:2, 0:2] = 1.0
    two[0, 5:7, 5:7] = 1.0
    assert floating_material(two)[0] == 1


def test_cg_solve_matches_dense(mech, dataset):
    """Matrix-free Jacobi-PCG solve == dense LU solve (the reference's
    `torch.linalg.solve`, residuals_mechanics_K.py:329-332)."""
    batch = split_mechanics_batch(jnp.asarray(dataset))
    rho = batch.solution[:, :-1, :-1, 2].reshape(2, -1)
    rho_bin = jnp.where(rho > 0.5, 1.0, 1e-3)
    f, mask = mech._bc_data(batch.bcs)
    K = mech.assemble_dense(rho_bin, mask)
    u_dense = jnp.linalg.solve(K, f[..., None])[..., 0]
    u_cg, relres = mech.solve(rho_bin, batch.bcs)
    # f32 CG floors around 1e-4..1e-2 on binarized systems; the authoritative
    # f64 check lives in topopt_eval_checked
    assert np.all(np.asarray(relres) < 1e-2)
    scale = jnp.abs(u_dense).max()
    np.testing.assert_allclose(
        np.asarray(u_cg) / float(scale),
        np.asarray(u_dense) / float(scale),
        atol=5e-4,
    )


def test_cg_converges_binarized_64x64():
    """VERDICT r1 item 6: on a full-size binarized design (contrast 1e3,
    neq=8450) the f32 device CG stagnates (relres ~1e-2) but its compliance
    — the metric rel_CE is built from — must match the exact f64
    sparse-direct host solve."""
    mech64 = MechanicsResidual(pixels_per_dim=64)
    nn = 65
    # cantilever-ish binarized design: solid beam + root block in a void sea
    rho = np.full((64, 64), 1e-3, np.float32)
    rho[28:36, :] = 1.0
    rho[:, 0:6] = 1.0
    bcs = np.zeros((1, nn, nn, 4), np.float32)
    bcs[0, :, 0, 0] = 1.0  # fix x on left edge
    bcs[0, :, 0, 1] = 1.0  # fix y on left edge
    bcs[0, 32, 64, 3] = -1.0  # point load at right mid
    rho_e = jnp.asarray(rho.reshape(1, -1))
    u, relres = mech64.solve(rho_e, jnp.asarray(bcs))
    assert float(relres[0]) < 5e-2

    u_host = mech64.solve_host(rho.reshape(-1), bcs[0])
    K, f, _ = mech64._assemble_sparse_host(rho.reshape(-1), bcs[0])
    assert np.linalg.norm(K @ u_host - f) / np.linalg.norm(f) < 1e-10
    comp_cg = float(np.asarray(u[0], np.float64) @ f)
    comp_host = float(u_host @ f)
    assert comp_cg == pytest.approx(comp_host, rel=1e-4)


def test_topopt_eval_checked_escalates(mech, dataset):
    """The host guard recomputes rel_CE from an exact f64 solve for any
    sample whose device solution fails the f64 residual check."""
    batch = split_mechanics_batch(jnp.asarray(dataset))
    x0_pred = jnp.concatenate(
        [
            batch.solution[:, :-1, :-1, :2],
            batch.solution[:, :-1, :-1, 2:3],
        ],
        axis=-1,
    )
    topopt = {k: np.asarray(v) for k, v in mech.topopt_eval(x0_pred, batch).items()}
    bcs_np = np.asarray(batch.bcs)

    # loose tol: nothing escalates, values pass through
    ok = mech.topopt_eval_checked(topopt, bcs_np, tol=1.0)
    assert ok["n_solve_fallback"] == 0
    np.testing.assert_array_equal(
        ok["rel_CE_error_full_batch"], topopt["rel_CE_error_full_batch"]
    )
    assert np.all(np.isfinite(ok["solve_relres_f64_full_batch"]))

    # impossible tol: every sample escalates; corrupted values are repaired
    bad = dict(topopt)
    bad["rel_CE_error_full_batch"] = np.full_like(
        topopt["rel_CE_error_full_batch"], 1e9
    )
    fixed = mech.topopt_eval_checked(bad, bcs_np, tol=0.0)
    assert fixed["n_solve_fallback"] == len(bcs_np)
    # exact-solve rel_CE agrees with the (converged) device CG rel_CE
    np.testing.assert_allclose(
        fixed["rel_CE_error_full_batch"],
        topopt["rel_CE_error_full_batch"],
        atol=1e-3,
    )


def test_stencil_Ku_matches_scatter(mech, dataset):
    """The stencil-form K u (hot path) equals the gather/scatter-add form
    and the Jacobi diagonal matches the dense assembly's diagonal."""
    rng = np.random.default_rng(11)
    B = 3
    rho = jnp.asarray(rng.uniform(1e-3, 1.0, (B, mech.nels)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(B, mech.neq)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(mech._Ku(rho, u)),
        np.asarray(mech._Ku_scatter(rho, u)),
        atol=1e-4,
    )
    mask = jnp.zeros((B, mech.neq), bool)
    K = mech.assemble_dense(rho, mask)
    np.testing.assert_allclose(
        np.asarray(mech._jacobi_diag(rho, mask)),
        np.asarray(jnp.diagonal(K, axis1=1, axis2=2)),
        rtol=1e-5,
    )
