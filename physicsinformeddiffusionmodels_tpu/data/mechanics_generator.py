"""Mechanics (topology-optimization) ground-truth generator.

Host-side sparse-FEM oracle + SIMP topology optimization producing the
10-channel 65x65 samples the mechanics study trains on (channel order
`/root/reference/src/data_utils.py:118`: vf, strain_energy_density_fem,
von_mises_stress, disp_x, disp_y, E_field, BC_node_x, BC_node_y, load_x_img,
load_y_img). The reference ships pre-generated data and only documents this
layout; the generator here recreates it so the framework is self-contained:

  * FEM discretization identical to the training residual — quad4 plane
    stress, E=1, nu=0.3, unit elements on a P x P grid
    (`residuals_mechanics_K.py:29-33,99-103` via physics.mechanics) — so the
    dataset satisfies the invariant the reference asserts at load time:
    K(E_field) u - f ~= 0 (`residuals_mechanics_K.py:303-305`).
  * Designs from classic SIMP (penal=3, sensitivity filter, optimality-
    criteria update; Sigmund's 99-line scheme) under randomized load/BC
    scenarios and volume fractions.
  * Displacements rescaled so max |u| = 1 per sample (keeps the diffusion
    targets O(1); the linear system scales consistently).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import scipy.sparse
import scipy.sparse.linalg

from physicsinformeddiffusionmodels_tpu.physics.mechanics import (
    grid_topology,
    quad4_stiffness,
)

E_MIN = 1e-3  # void stiffness floor (matches the topopt-eval binarization
# floor, `residuals_mechanics_K.py:309-311`)


def _plane_stress_C(E: float = 1.0, nu: float = 0.3) -> np.ndarray:
    return E / (1 - nu**2) * np.array(
        [[1.0, nu, 0.0], [nu, 1.0, 0.0], [0.0, 0.0, (1 - nu) / 2]]
    )


def _center_B(side: float = 1.0) -> np.ndarray:
    """Strain-displacement matrix at the element center (xi=eta=0) for the
    square quad4 with the physics layer's CCW node order."""
    corners = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])
    coords = corners * side / 2.0
    dN = 0.25 * np.array([[-1.0, 1.0, 1.0, -1.0], [-1.0, -1.0, 1.0, 1.0]])
    J = dN @ coords
    dNdx = np.linalg.solve(J, dN)
    B = np.zeros((3, 8))
    B[0, 0::2] = dNdx[0]
    B[1, 1::2] = dNdx[1]
    B[2, 0::2] = dNdx[1]
    B[2, 1::2] = dNdx[0]
    return B


class MechanicsFEM:
    """Sparse FEM oracle on the structured quad grid (the role solidspy plays
    for the reference, `residuals_mechanics_K.py:43-103`)."""

    def __init__(self, nels_per_side: int, E: float = 1.0, nu: float = 0.3):
        topo = grid_topology(nels_per_side)
        self.nels_per_side = nels_per_side
        self.nels = topo["nels"]
        self.nn = topo["nn"]
        self.neq = topo["neq"]
        self.elem_dofs = topo["elem_dofs"]  # [nels, 8] int32
        self.k_loc = quad4_stiffness(E, nu)
        self.C = _plane_stress_C(E, nu)
        self.B_center = _center_B()
        # COO pattern of the assembled matrix (constant across densities)
        self._rows = np.repeat(self.elem_dofs, 8, axis=1).ravel()
        self._cols = np.tile(self.elem_dofs, (1, 8)).ravel()

    def assemble(self, densities: np.ndarray) -> scipy.sparse.csr_matrix:
        """Global stiffness K(rho) = sum_e rho_e k_loc, sparse CSR."""
        vals = (densities[:, None, None] * self.k_loc[None]).ravel()
        K = scipy.sparse.coo_matrix(
            (vals, (self._rows, self._cols)), shape=(self.neq, self.neq)
        )
        return K.tocsr()

    def solve(
        self, densities: np.ndarray, f: np.ndarray, fixed: np.ndarray
    ) -> np.ndarray:
        """Solve K(rho) u = f with homogeneous Dirichlet dofs ``fixed``
        (bool [neq]); returns u [neq] with zeros at fixed dofs."""
        K = self.assemble(densities)
        free = ~fixed
        K_ff = K[free][:, free]
        u = np.zeros(self.neq)
        u[free] = scipy.sparse.linalg.spsolve(K_ff.tocsc(), f[free])
        return u

    def element_disp(self, u: np.ndarray) -> np.ndarray:
        return u[self.elem_dofs]  # [nels, 8]

    def element_energy(self, u: np.ndarray) -> np.ndarray:
        """Unit-density strain energy 0.5 u_e^T k_loc u_e per element."""
        u_e = self.element_disp(u)
        return 0.5 * np.einsum("ep,pq,eq->e", u_e, self.k_loc, u_e)

    def element_stress(self, u: np.ndarray, densities: np.ndarray) -> np.ndarray:
        """Center stress sigma = rho_e C B u_e, [nels, 3] (sx, sy, txy)."""
        u_e = self.element_disp(u)
        return densities[:, None] * (u_e @ (self.C @ self.B_center).T)

    def von_mises(self, u: np.ndarray, densities: np.ndarray) -> np.ndarray:
        s = self.element_stress(u, densities)
        sx, sy, t = s[:, 0], s[:, 1], s[:, 2]
        return np.sqrt(np.maximum(sx**2 - sx * sy + sy**2 + 3 * t**2, 0.0))


def _filter_matrix(P: int, rmin: float) -> scipy.sparse.csr_matrix:
    """Linear-decay density/sensitivity filter weights H[e, f] =
    max(0, rmin - dist(centers)) on the element grid."""
    a, b = np.meshgrid(np.arange(P), np.arange(P), indexing="ij")
    centers = np.stack([a.ravel(), b.ravel()], axis=1).astype(np.float64)
    reach = int(np.ceil(rmin)) - 1
    rows, cols, vals = [], [], []
    for e in range(P * P):
        ci, cj = centers[e]
        i0, i1 = max(0, int(ci) - reach), min(P - 1, int(ci) + reach)
        j0, j1 = max(0, int(cj) - reach), min(P - 1, int(cj) + reach)
        for i in range(i0, i1 + 1):
            for j in range(j0, j1 + 1):
                w = rmin - np.hypot(ci - i, cj - j)
                if w > 0:
                    rows.append(e)
                    cols.append(i * P + j)
                    vals.append(w)
    return scipy.sparse.csr_matrix(
        (vals, (rows, cols)), shape=(P * P, P * P)
    )


def simp_topopt(
    fem: MechanicsFEM,
    vf: float,
    f: np.ndarray,
    fixed: np.ndarray,
    penal: float = 3.0,
    n_iter: int = 30,
    rmin: float = 1.5,
    move: float = 0.2,
) -> np.ndarray:
    """SIMP compliance minimization at volume fraction ``vf``: sensitivity
    filter + optimality-criteria update (Sigmund 2001). Returns rho [nels]
    in [1e-3, 1]."""
    P = fem.nels_per_side
    H = _filter_matrix(P, rmin)
    Hs = np.asarray(H.sum(axis=1)).ravel()
    rho = np.full(fem.nels, vf)
    for _ in range(n_iter):
        E = E_MIN + rho**penal * (1.0 - E_MIN)
        u = fem.solve(E, f, fixed)
        ce = 2.0 * fem.element_energy(u)  # u_e^T k u_e
        dc = -penal * rho ** (penal - 1) * (1.0 - E_MIN) * ce
        # sensitivity filter
        dc = (H @ (rho * dc)) / (Hs * np.maximum(rho, 1e-3))
        # OC bisection on the volume multiplier
        l1, l2 = 0.0, 1e9
        while l2 - l1 > 1e-4 * (l1 + l2 + 1e-12):
            lmid = 0.5 * (l1 + l2)
            cand = rho * np.sqrt(np.maximum(-dc, 0.0) / max(lmid, 1e-12))
            rho_new = np.clip(
                cand, np.maximum(rho - move, 1e-3), np.minimum(rho + move, 1.0)
            )
            if rho_new.mean() > vf:
                l1 = lmid
            else:
                l2 = lmid
        rho = rho_new
    return rho


def _scenario_cantilever(fem: MechanicsFEM, rng: np.random.Generator):
    """Training family: left edge fully clamped, unit point load at a random
    right-edge node with a random direction."""
    nn = fem.nn
    fixed = np.zeros(fem.neq, bool)
    left_nodes = np.arange(nn) * nn  # nodes (i, 0)
    fixed[2 * left_nodes] = True
    fixed[2 * left_nodes + 1] = True

    load_row = int(rng.integers(0, nn))
    load_node = load_row * nn + (nn - 1)
    angle = rng.uniform(-np.pi / 2, np.pi / 2)
    f = np.zeros(fem.neq)
    f[2 * load_node] = np.cos(angle) * 0.2  # mild x component
    f[2 * load_node + 1] = -abs(np.sin(angle)) - 0.2  # downward y
    return fixed, f


def _edge_nodes(fem: MechanicsFEM, edge: str) -> np.ndarray:
    """Node ids along one boundary edge. Node (i, j) has id i*nn + j with
    y = i (row) and x = j (column)."""
    nn = fem.nn
    r = np.arange(nn)
    return {
        "left": r * nn,
        "right": r * nn + (nn - 1),
        "bottom": r,  # i = 0
        "top": (nn - 1) * nn + r,
    }[edge]


_OPPOSITE_EDGE = {"left": "right", "right": "left", "bottom": "top", "top": "bottom"}


def _scenario_edge_cantilever(fem: MechanicsFEM, rng: np.random.Generator):
    """Training family: ONE full edge (chosen uniformly from all four) fully
    clamped, unit-magnitude point load at a random node of the opposite edge
    with a direction drawn from the full circle. Teaches the conditioning
    channels that the support edge and load direction vary — left-clamp-only
    training lets the model ignore the BC images entirely, which is what
    produced the round-2 OOD rel_CE tail."""
    edge = ("left", "right", "bottom", "top")[int(rng.integers(0, 4))]
    fixed = np.zeros(fem.neq, bool)
    en = _edge_nodes(fem, edge)
    fixed[2 * en] = True
    fixed[2 * en + 1] = True

    load_nodes = _edge_nodes(fem, _OPPOSITE_EDGE[edge])
    load_node = int(load_nodes[rng.integers(0, len(load_nodes))])
    theta = rng.uniform(0.0, 2 * np.pi)
    f = np.zeros(fem.neq)
    f[2 * load_node] = np.cos(theta)
    f[2 * load_node + 1] = np.sin(theta)
    return fixed, f


def _scenario_partial_clamp(fem: MechanicsFEM, rng: np.random.Generator):
    """Training family: a random contiguous span (1/3 .. 3/4 of the edge) of a
    random edge clamped, unit point load at a random boundary node that is not
    fixed. Varies support EXTENT as well as placement; still a single
    contiguous clamp + single load, so the level-2 families (two loads;
    pin+roller point supports; two full edges clamped) remain unseen."""
    nn = fem.nn
    edge = ("left", "right", "bottom", "top")[int(rng.integers(0, 4))]
    en = _edge_nodes(fem, edge)
    span = int(rng.integers(nn // 3, 3 * nn // 4 + 1))
    start = int(rng.integers(0, nn - span + 1))
    clamped = en[start : start + span]
    fixed = np.zeros(fem.neq, bool)
    fixed[2 * clamped] = True
    fixed[2 * clamped + 1] = True

    boundary = np.unique(
        np.concatenate([_edge_nodes(fem, e) for e in ("left", "right", "bottom", "top")])
    )
    free = boundary[~fixed[2 * boundary]]
    load_node = int(free[rng.integers(0, len(free))])
    theta = rng.uniform(0.0, 2 * np.pi)
    f = np.zeros(fem.neq)
    f[2 * load_node] = np.cos(theta)
    f[2 * load_node + 1] = np.sin(theta)
    return fixed, f


def _scenario_cantilever_multiload(fem: MechanicsFEM, rng: np.random.Generator):
    """OOD: left edge clamped, TWO independent right-edge point loads —
    load multiplicity never seen in training."""
    nn = fem.nn
    fixed = np.zeros(fem.neq, bool)
    left_nodes = np.arange(nn) * nn
    fixed[2 * left_nodes] = True
    fixed[2 * left_nodes + 1] = True

    f = np.zeros(fem.neq)
    rows = rng.choice(nn, size=2, replace=False)
    for load_row in rows:
        load_node = int(load_row) * nn + (nn - 1)
        angle = rng.uniform(-np.pi / 2, np.pi / 2)
        f[2 * load_node] += np.cos(angle) * 0.2
        f[2 * load_node + 1] += -abs(np.sin(angle)) - 0.2
    return fixed, f


def _scenario_bridge(fem: MechanicsFEM, rng: np.random.Generator):
    """OOD: simply-supported 'bridge' — bottom-left corner pinned (x+y),
    bottom-right corner roller (y), downward point load on a random top-edge
    node. Support topology never seen in training."""
    nn = fem.nn
    fixed = np.zeros(fem.neq, bool)
    # node (i, j) has id i*nn + j with y=i: bottom edge is i = 0
    bl = 0  # node (0, 0)
    br = nn - 1  # node (0, nn-1)
    fixed[2 * bl] = True
    fixed[2 * bl + 1] = True
    fixed[2 * br + 1] = True

    load_col = int(rng.integers(nn // 4, 3 * nn // 4))
    load_node = (nn - 1) * nn + load_col  # top edge (i = nn-1)
    f = np.zeros(fem.neq)
    f[2 * load_node] = rng.uniform(-0.2, 0.2)
    f[2 * load_node + 1] = -1.0
    return fixed, f


def _scenario_double_clamp(fem: MechanicsFEM, rng: np.random.Generator):
    """OOD: BOTH vertical edges fully clamped, downward load at a random
    bottom-edge node in the middle half."""
    nn = fem.nn
    fixed = np.zeros(fem.neq, bool)
    left_nodes = np.arange(nn) * nn
    right_nodes = np.arange(nn) * nn + (nn - 1)
    for nodes in (left_nodes, right_nodes):
        fixed[2 * nodes] = True
        fixed[2 * nodes + 1] = True

    load_col = int(rng.integers(nn // 4, 3 * nn // 4))
    load_node = 0 * nn + load_col  # bottom edge (i = 0)
    angle = rng.uniform(-np.pi / 2, np.pi / 2)
    f = np.zeros(fem.neq)
    f[2 * load_node] = np.cos(angle) * 0.2
    f[2 * load_node + 1] = -abs(np.sin(angle)) - 0.2
    return fixed, f


# in-distribution = the training family; test_level_2 mixes the three OOD
# support/load topologies (reference split semantics: `sample.py:244-342`
# evaluates test_level_1 (in-) and test_level_2 (out-of-distribution))
SCENARIO_FAMILIES = {
    "cantilever": _scenario_cantilever,
    "edge_cantilever": _scenario_edge_cantilever,
    "partial_clamp": _scenario_partial_clamp,
    "cantilever_multiload": _scenario_cantilever_multiload,
    "bridge": _scenario_bridge,
    "double_clamp": _scenario_double_clamp,
}

# The diversified training mix (v2 data): support edge/extent and load
# direction all vary, so the BC/load conditioning channels carry real signal
# (matching the reference dataset's randomized supports+loads). The OOD
# level-2 families stay held out of this mix.
IN_DIST_FAMILIES = ("cantilever", "edge_cantilever", "partial_clamp")
OOD_FAMILIES = ("cantilever_multiload", "bridge", "double_clamp")


def fields_from_design(
    fem: MechanicsFEM,
    rho: np.ndarray,
    fixed: np.ndarray,
    f: np.ndarray,
    penal: float = 3.0,
) -> np.ndarray:
    """[nn, nn, 10] sample (reference channel order) from a converged design.

    The FINAL solve is always this host-side exact sparse-LU — regardless of
    how the design ``rho`` was optimized (host SIMP or the TPU-batched SIMP
    in ``mechanics_generator_tpu``) — so every emitted sample satisfies the
    invariant the reference asserts at load time, K(E) u - f ~= 0
    (`residuals_mechanics_K.py:303-305`), to solver precision.
    """
    P, nn = fem.nels_per_side, fem.nn
    e_field = E_MIN + rho**penal * (1.0 - E_MIN)
    u = fem.solve(e_field, f, fixed)

    # rescale so max |u| = 1 (consistent linear scaling of u and f)
    scale = 1.0 / max(np.abs(u).max(), 1e-12)
    u = u * scale
    f = f * scale

    sed = e_field * fem.element_energy(u)  # [nels]
    vm = fem.von_mises(u, e_field)

    def pad_elem(x):
        return np.pad(x.reshape(P, P), ((0, 1), (0, 1)))

    disp = u.reshape(nn * nn, 2)
    bc_x = np.zeros(nn * nn)
    bc_y = np.zeros(nn * nn)
    bc_x[fixed[0::2]] = 1.0
    bc_y[fixed[1::2]] = 1.0
    load = f.reshape(nn * nn, 2)

    channels = [
        np.full((nn, nn), e_field.mean()),  # vf conditioning (achieved)
        pad_elem(sed),
        pad_elem(vm),
        disp[:, 0].reshape(nn, nn),
        disp[:, 1].reshape(nn, nn),
        pad_elem(e_field),
        bc_x.reshape(nn, nn),
        bc_y.reshape(nn, nn),
        load[:, 0].reshape(nn, nn),
        load[:, 1].reshape(nn, nn),
    ]
    return np.stack(channels, axis=-1).astype(np.float32)


def generate_sample(
    fem: MechanicsFEM,
    rng: np.random.Generator,
    penal: float = 3.0,
    n_iter: int = 30,
    family: str = "cantilever",
    vf_range: tuple[float, float] = (0.3, 0.6),
) -> np.ndarray:
    """One [nn, nn, 10] sample in the reference channel order."""
    vf = float(rng.uniform(*vf_range))
    fixed, f = SCENARIO_FAMILIES[family](fem, rng)
    rho = simp_topopt(fem, vf, f, fixed, penal=penal, n_iter=n_iter)
    return fields_from_design(fem, rho, fixed, f, penal=penal)


def generate_dataset(
    n_samples: int,
    nels_per_side: int = 64,
    seed: int = 0,
    out_dir: str | None = None,
    penal: float = 3.0,
    n_iter: int = 30,
    families: tuple[str, ...] = ("cantilever",),
    vf_range: tuple[float, float] = (0.3, 0.6),
) -> np.ndarray:
    """Generate [N, nn, nn, 10] mechanics samples; with ``out_dir``, write
    per-sample ``<i>.npy`` files (the layout ``NpyFieldDataset`` loads).

    ``families`` cycles round-robin over scenario families — the training /
    test_level_1 sets use the default cantilever family; test_level_2 mixes
    the OOD families (and optionally a shifted ``vf_range``)."""
    fem = MechanicsFEM(nels_per_side)
    rng = np.random.default_rng(seed)
    samples = np.stack(
        [
            generate_sample(
                fem, rng, penal=penal, n_iter=n_iter,
                family=families[i % len(families)], vf_range=vf_range,
            )
            for i in range(n_samples)
        ]
    )
    if out_dir is not None:
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        for i, s in enumerate(samples):
            np.save(out / f"{i}.npy", s)
    return samples
