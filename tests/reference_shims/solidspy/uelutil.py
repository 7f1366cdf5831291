"""solidspy.uelutil.elast_quad4 stand-in.

Standard isoparametric bilinear quad, plane stress, 2x2 Gauss quadrature —
the published formulation solidspy implements (nodes counter-clockwise from
(-1,-1); dofs interleaved [u1x, u1y, ..., u4x, u4y]). The reference calls it
with E=1, nu=0.3 and unit-square element coordinates
(`residuals_mechanics_K.py:29-33,99-103`).
"""

import numpy as np


def elast_quad4(coord, params):
    """coord: [4, 2] node coordinates (CCW); params: [E, nu, ...].

    Returns (stiffness [8, 8], mass [8, 8]); mass is not used by the
    reference and returned as zeros.
    """
    E, nu = float(params[0]), float(params[1])
    C = E / (1.0 - nu**2) * np.array(
        [[1.0, nu, 0.0], [nu, 1.0, 0.0], [0.0, 0.0, (1.0 - nu) / 2.0]]
    )
    coord = np.asarray(coord, dtype=np.float64)
    gp = np.array([-1.0, 1.0]) / np.sqrt(3.0)
    K = np.zeros((8, 8))
    for xi in gp:
        for eta in gp:
            dN = 0.25 * np.array(
                [
                    [-(1 - eta), (1 - eta), (1 + eta), -(1 + eta)],
                    [-(1 - xi), -(1 + xi), (1 + xi), (1 - xi)],
                ]
            )
            J = dN @ coord
            dNdx = np.linalg.solve(J, dN)
            B = np.zeros((3, 8))
            B[0, 0::2] = dNdx[0]
            B[1, 1::2] = dNdx[1]
            B[2, 0::2] = dNdx[1]
            B[2, 1::2] = dNdx[0]
            K += B.T @ C @ B * np.linalg.det(J)
    return K, np.zeros((8, 8))
