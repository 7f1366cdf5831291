"""TPU-batched SIMP topology-optimization design generator.

The host generator (``mechanics_generator``) optimizes one design at a time
with sparse-LU solves — seconds per sample on a CPU core, hours for a
training set. Here the entire SIMP loop runs on the accelerator, BATCHED
over independent scenarios:

  * the FEM solve is the framework's matrix-free batched Jacobi-PCG
    (gather -> [8,8] einsum on the MXU -> scatter-add, no assembled matrix),
    warm-started from the previous SIMP iteration's displacement field —
    designs change slowly between OC updates, so CG restarts near the
    solution;
  * the sensitivity filter H @ (rho * dc) is exactly a 3x3 convolution with
    the linear-decay kernel (rmin = 1.5 reaches only adjacent elements);
    the normalization Hs = H @ 1 is the same convolution of ones — both map
    straight onto XLA's conv emitter (boundary truncation == zero padding);
  * the optimality-criteria bisection is vectorized over the batch with a
    fixed-trip lax.fori_loop (64 halvings from [0, 1e9] reach the host
    loop's relative tolerance for every sample — compiler-friendly control
    flow instead of the per-sample data-dependent while).

One [64, 64x64]-batch of 30-iteration SIMP designs takes seconds on a v5e
chip vs minutes on the host. The FINAL displacement solve + channel build
stays on the host (``fields_from_design``: exact f64 sparse LU) so the
emitted dataset satisfies K(E) u - f ~= 0 to direct-solver precision — the
invariant the reference asserts at data-load time
(`/root/reference/src/residuals_mechanics_K.py:303-305`).

Reference counterpart: none — the reference ships pre-generated data
(SURVEY §2.3); this subsystem makes the framework self-contained at
training-set scale.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from physicsinformeddiffusionmodels_tpu.data.mechanics_generator import (
    E_MIN,
    SCENARIO_FAMILIES,
    MechanicsFEM,
    fields_from_design,
)
from physicsinformeddiffusionmodels_tpu.physics.mechanics import MechanicsResidual


class SimpScenario(NamedTuple):
    """Device-side batch of load cases (all [B, ...])."""

    f: jax.Array  # [B, neq] load vectors
    mask: jax.Array  # [B, neq] bool Dirichlet mask
    vf: jax.Array  # [B] target volume fractions


def _filter_kernel(rmin: float) -> np.ndarray:
    """Linear-decay filter weights as a dense (2r-1)^2 conv kernel."""
    reach = int(np.ceil(rmin)) - 1
    size = 2 * reach + 1
    k = np.zeros((size, size))
    for di in range(-reach, reach + 1):
        for dj in range(-reach, reach + 1):
            w = rmin - np.hypot(di, dj)
            if w > 0:
                k[di + reach, dj + reach] = w
    return k


def _conv_filter(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """[B, P, P] (x) kernel with zero padding — H @ x on the element grid."""
    return jax.lax.conv_general_dilated(
        x[:, None],  # NCHW
        kernel[None, None].astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
    )[:, 0]


class TpuSimpGenerator:
    """Batched SIMP compliance minimization on the accelerator."""

    def __init__(
        self,
        nels_per_side: int = 64,
        penal: float = 3.0,
        rmin: float = 1.5,
        move: float = 0.2,
        n_iter: int = 30,
        cg_tol: float = 1e-5,
        cg_maxiter: int = 600,
    ):
        self.P = nels_per_side
        self.penal = penal
        self.move = move
        self.n_iter = n_iter
        self.cg_tol = cg_tol
        self.cg_maxiter = cg_maxiter
        self.mech = MechanicsResidual(pixels_per_dim=nels_per_side)
        self.kernel = jnp.asarray(_filter_kernel(rmin), jnp.float32)
        # Hs = H @ 1 (row sums; boundary rows lose out-of-domain weight)
        ones = jnp.ones((1, self.P, self.P), jnp.float32)
        self.Hs = _conv_filter(ones, self.kernel)[0]

    # ------------------------------------------------------------ scenarios

    def scenarios_from_host(
        self, fixed: np.ndarray, f: np.ndarray, vf: np.ndarray
    ) -> SimpScenario:
        """Pack host-sampled load cases ([B, neq] fixed/f, [B] vf)."""
        return SimpScenario(
            f=jnp.asarray(f, jnp.float32),
            mask=jnp.asarray(fixed, bool),
            vf=jnp.asarray(vf, jnp.float32),
        )

    # ------------------------------------------------------------- solver

    def _solve_pcg(self, e_field, scen: SimpScenario, u0):
        """Batched matrix-free Jacobi-PCG of K_bc(E) u = f, warm start u0."""
        mech = self.mech
        f = jnp.where(scen.mask, 0.0, scen.f)
        diag = mech._jacobi_diag(e_field, scen.mask)

        def matvec(u):
            ku = mech._Ku(e_field, u)
            return jnp.where(scen.mask, u, ku)

        u, _ = jax.scipy.sparse.linalg.cg(
            matvec, f, x0=jnp.where(scen.mask, 0.0, u0),
            tol=self.cg_tol, maxiter=self.cg_maxiter, M=lambda r: r / diag
        )
        return u

    # ---------------------------------------------------------- SIMP update

    def _element_compliance(self, u: jax.Array) -> jax.Array:
        """ce_e = u_e^T k_loc u_e (unit density), [B, nels]."""
        u_e = u[:, self.mech.elem_dofs]
        # VPU broadcast-sum, exact f32 (TPU einsum defaults to bf16
        # multiplies; see MechanicsResidual._Ku)
        ku_e = (u_e[:, :, None, :] * self.mech.k_loc[None, None]).sum(-1)
        return (u_e * ku_e).sum(-1)

    def _oc_update(self, rho, dc, vf):
        """Vectorized optimality-criteria bisection (Sigmund 2001), fixed
        64 halvings of the volume multiplier per sample."""
        move = self.move
        sens = jnp.sqrt(jnp.maximum(-dc, 0.0))

        def body(_, lims):
            l1, l2 = lims
            lmid = 0.5 * (l1 + l2)
            cand = rho * sens / jnp.sqrt(jnp.maximum(lmid, 1e-12))[:, None]
            rho_new = jnp.clip(
                cand, jnp.maximum(rho - move, 1e-3), jnp.minimum(rho + move, 1.0)
            )
            over = rho_new.mean(axis=1) > vf
            return jnp.where(over, lmid, l1), jnp.where(over, l2, lmid)

        l1 = jnp.zeros(rho.shape[0])
        l2 = jnp.full(rho.shape[0], 1e9)
        l1, l2 = jax.lax.fori_loop(0, 64, body, (l1, l2))
        lmid = 0.5 * (l1 + l2)
        cand = rho * sens / jnp.sqrt(jnp.maximum(lmid, 1e-12))[:, None]
        return jnp.clip(
            cand, jnp.maximum(rho - move, 1e-3), jnp.minimum(rho + move, 1.0)
        )

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def _optimize_chunk(self, carry, length: int, scen: SimpScenario):
        """``length`` SIMP iterations on a (rho, u) carry — one device call.

        Kept short on purpose: the tunneled backend enforces a per-execution
        deadline (one monolithic 50-iteration scan dies with UNAVAILABLE
        mid-run; 25 iterations complete), so ``optimize`` drives this in
        host-chunked calls instead of one long scan."""
        B = scen.f.shape[0]
        P = self.P
        penal = self.penal

        def body(carry, _):
            rho, u = carry
            e_field = E_MIN + rho**penal * (1.0 - E_MIN)
            u = self._solve_pcg(e_field, scen, u)
            # ce_e = u_e^T k u_e (unit density); dc = dE/drho * (-ce)
            ce = self._element_compliance(u)
            dc = -penal * rho ** (penal - 1) * (1.0 - E_MIN) * ce
            # sensitivity filter (H @ (rho*dc)) / (Hs * max(rho, 1e-3))
            num = _conv_filter((rho * dc).reshape(B, P, P), self.kernel)
            dc_f = num.reshape(B, P * P) / (
                self.Hs.reshape(1, P * P) * jnp.maximum(rho, 1e-3)
            )
            rho = self._oc_update(rho, dc_f, scen.vf)
            return (rho, u), None

        return jax.lax.scan(body, carry, None, length=length)[0]

    @functools.partial(jax.jit, static_argnums=0)
    def _final_residual(self, carry, scen: SimpScenario):
        """Relative residual of one more (warm-started) solve on the final
        design — the warm-start quality signal returned by ``optimize``."""
        rho, u = carry
        e_field = E_MIN + rho**self.penal * (1.0 - E_MIN)
        f = jnp.where(scen.mask, 0.0, scen.f)
        ku = self.mech._Ku(e_field, self._solve_pcg(e_field, scen, u))
        r = jnp.where(scen.mask, 0.0, ku) - f
        return jnp.linalg.norm(r, axis=1) / jnp.maximum(
            jnp.linalg.norm(f, axis=1), 1e-30
        )

    def optimize(
        self, scen: SimpScenario, chunk_iters: int = 10
    ) -> tuple[jax.Array, jax.Array]:
        """Run ``n_iter`` SIMP iterations for the whole batch, in
        ``chunk_iters``-sized device calls (see ``_optimize_chunk``).

        Returns (rho [B, nels], relres [B]) — final designs and the true
        relative residual of the LAST device solve (a warm-start quality
        signal; the emitted dataset's exactness comes from the host LU in
        ``fields_from_design``, not from this)."""
        B = scen.f.shape[0]
        rho0 = jnp.broadcast_to(
            scen.vf[:, None], (B, self.P * self.P)
        ).astype(jnp.float32)
        carry = (rho0, jnp.zeros((B, self.mech.neq), jnp.float32))
        left = self.n_iter
        while left > 0:
            n = min(chunk_iters, left)
            carry = jax.block_until_ready(self._optimize_chunk(carry, n, scen))
            left -= n
        return carry[0], self._final_residual(carry, scen)


def generate_dataset_tpu(
    n_samples: int,
    nels_per_side: int = 64,
    seed: int = 0,
    out_dir: str | None = None,
    batch: int = 64,
    penal: float = 3.0,
    n_iter: int = 30,
    families: tuple[str, ...] = ("cantilever",),
    vf_range: tuple[float, float] = (0.3, 0.6),
    start_index: int = 0,
    verbose: bool = False,
) -> np.ndarray:
    """Accelerated twin of ``mechanics_generator.generate_dataset``: designs
    optimized on the device in batches, channels built on the host from an
    exact final solve. Same output layout (per-sample ``<i>.npy``)."""
    from pathlib import Path

    fem = MechanicsFEM(nels_per_side)
    gen = TpuSimpGenerator(nels_per_side, penal=penal, n_iter=n_iter)
    rng = np.random.default_rng(seed)
    neq = fem.neq

    out = None
    if out_dir is not None:
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)

    samples = []
    idx = start_index
    done = 0
    while done < n_samples:
        nb = min(batch, n_samples - done)
        fixed = np.zeros((batch, neq), bool)
        f = np.zeros((batch, neq))
        vf = np.zeros(batch)
        fams = []
        for b in range(batch):
            fam = families[(done + b) % len(families)]
            fams.append(fam)
            fixed[b], f[b] = SCENARIO_FAMILIES[fam](fem, rng)
            vf[b] = rng.uniform(*vf_range)
        scen = gen.scenarios_from_host(fixed, f, vf)
        rho, relres = jax.block_until_ready(gen.optimize(scen))
        rho = np.asarray(rho, np.float64)
        if verbose:
            print(
                f"  batch of {nb}: device SIMP done, "
                f"last-solve relres max {float(np.asarray(relres).max()):.2e}"
            )
        for b in range(nb):
            s = fields_from_design(fem, rho[b], fixed[b], f[b], penal=penal)
            samples.append(s)
            if out is not None:
                np.save(out / f"{idx}.npy", s)
            idx += 1
        done += nb
    return np.stack(samples)
