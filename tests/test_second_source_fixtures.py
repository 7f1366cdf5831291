"""Independent second-source fixtures for the reference-parity shims.

The torch reference executes through builder-authored shims for
``solidspy.elast_quad4`` and ``findiff`` (tests/reference_shims/). A wrong
constant shared by a shim and the framework would pass every parity test —
so this file pins PASTED literals from independently published sources and
asserts them against BOTH the shim and the framework:

- quad4 stiffness: the element stiffness matrix of the 99/88-line topology
  optimization codes (Sigmund 2001 "A 99 line topology optimization code",
  Andreassen et al. 2011 top88), unit square, plane stress, E=1, nu=0.3 —
  a published closed-form 8x8 literal.
- finite differences: the standard acc=2 central/one-sided coefficient
  tables (Fornberg 1988, Table 1; also the findiff docs) for d/dx and
  d2/dx2, pasted as decimals.
"""

import numpy as np

from physicsinformeddiffusionmodels_tpu.ops.fd import derivative_matrix
from physicsinformeddiffusionmodels_tpu.physics.mechanics import quad4_stiffness

# --------------------------------------------------------------------------
# top88 element stiffness literal (E=1, nu=0.3, unit square, plane stress).
# k entries evaluated by hand from the published formula
#   k = [1/2-nu/6, 1/8+nu/8, -1/4-nu/12, -1/8+3nu/8,
#        -1/4+nu/12, -1/8-nu/8, nu/6, 1/8-3nu/8],  KE = 1/(1-nu^2) * pattern
# with nu = 0.3:
_K = [0.45, 0.1625, -0.275, -0.0125, -0.225, -0.1625, 0.05, 0.0125]
# published symmetric circulant-like index pattern (top88 line 86-93)
_IDX = [
    [0, 1, 2, 3, 4, 5, 6, 7],
    [1, 0, 7, 6, 5, 4, 3, 2],
    [2, 7, 0, 5, 6, 3, 4, 1],
    [3, 6, 5, 0, 7, 2, 1, 4],
    [4, 5, 6, 7, 0, 1, 2, 3],
    [5, 4, 3, 2, 1, 0, 7, 6],
    [6, 3, 4, 1, 2, 7, 0, 5],
    [7, 2, 1, 4, 3, 6, 5, 0],
]
TOP88_KE = np.array(_K)[np.array(_IDX)] / (1.0 - 0.3**2)


def test_quad4_matches_top88_literal():
    K = quad4_stiffness(E=1.0, nu=0.3, side=1.0)
    np.testing.assert_allclose(K, TOP88_KE, atol=1e-14)


def test_solidspy_shim_matches_top88_literal():
    from tests.reference_shims.solidspy.uelutil import elast_quad4

    coord = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    K, _ = elast_quad4(coord, [1.0, 0.3])
    np.testing.assert_allclose(K, TOP88_KE, atol=1e-14)


# --------------------------------------------------------------------------
# Standard acc=2 finite-difference tables (Fornberg 1988, Table 1):
#   d/dx   centered: [-1/2, 0, 1/2];  forward: [-3/2, 2, -1/2]
#   d2/dx2 centered: [1, -2, 1];      forward: [2, -5, 4, -1]
FD1_CENTERED = [-0.5, 0.0, 0.5]
FD1_FORWARD = [-1.5, 2.0, -0.5]
FD2_CENTERED = [1.0, -2.0, 1.0]
FD2_FORWARD = [2.0, -5.0, 4.0, -1.0]


def test_derivative_matrix_matches_published_tables():
    n = 8
    D1 = np.asarray(derivative_matrix(n, 1.0, 1, acc=2), np.float64)
    np.testing.assert_allclose(D1[0, :3], FD1_FORWARD, atol=1e-6)
    np.testing.assert_allclose(D1[3, 2:5], FD1_CENTERED, atol=1e-6)
    # backward (high boundary) = mirrored forward with sign flip for odd m
    np.testing.assert_allclose(D1[-1, -3:], [0.5, -2.0, 1.5], atol=1e-6)

    D2 = np.asarray(derivative_matrix(n, 1.0, 2, acc=2), np.float64)
    np.testing.assert_allclose(D2[0, :4], FD2_FORWARD, atol=1e-6)
    np.testing.assert_allclose(D2[3, 2:5], FD2_CENTERED, atol=1e-6)
    np.testing.assert_allclose(D2[-1, -4:], [-1.0, 4.0, -5.0, 2.0], atol=1e-6)


def test_findiff_shim_matches_published_tables():
    from tests.reference_shims.findiff import FinDiff

    s1 = FinDiff(0, 1.0, 1, acc=2).stencil((9, 9)).data
    assert s1[("L", "C")] == {(0, 0): -1.5, (1, 0): 2.0, (2, 0): -0.5}
    assert s1[("C", "C")] == {(-1, 0): -0.5, (0, 0): 0.0, (1, 0): 0.5}
    assert s1[("H", "C")] == {(0, 0): 1.5, (-1, 0): -2.0, (-2, 0): 0.5}

    s2 = FinDiff(1, 1.0, 2, acc=2).stencil((9, 9)).data
    assert s2[("C", "L")] == {(0, 0): 2.0, (0, 1): -5.0, (0, 2): 4.0, (0, 3): -1.0}
    assert s2[("C", "C")] == {(0, -1): 1.0, (0, 0): -2.0, (0, 1): 1.0}
