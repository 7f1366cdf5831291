"""Minimal ``findiff`` stand-in for executing the reference implementation.

The reference uses findiff only to obtain 2D stencil coefficient tables at
construction time (`/root/reference/src/grad_utils.py:154-159`):
``FinDiff(axis, spacing, order, acc=2).stencil((99, 99)).data`` — a dict
mapping region keys ``('C'|'L'|'H', 'C'|'L'|'H')`` to ``{(i, j): coef}``.

Coefficients here are the published standard acc=2 tables (hard-coded — NOT
derived from the repo's own Fornberg generator, so the reference-parity
tests have an independent anchor). Only acc=2 is supported, which is what
`model.yaml:13` pins.
"""

# 1D stencils per (derivative order, region), unit spacing, accuracy 2.
# 'C' = centered, 'L' = one-sided forward (low boundary), 'H' = backward.
_TABLES = {
    (1, "C"): {-1: -0.5, 0: 0.0, 1: 0.5},
    (1, "L"): {0: -1.5, 1: 2.0, 2: -0.5},
    (1, "H"): {0: 1.5, -1: -2.0, -2: 0.5},
    (2, "C"): {-1: 1.0, 0: -2.0, 1: 1.0},
    (2, "L"): {0: 2.0, 1: -5.0, 2: 4.0, 3: -1.0},
    (2, "H"): {0: 2.0, -1: -5.0, -2: 4.0, -3: -1.0},
    # identity along an axis with no derivative term
    (0, "C"): {0: 1.0},
    (0, "L"): {0: 1.0},
    (0, "H"): {0: 1.0},
}


class _Stencil:
    def __init__(self, data):
        self.data = data


class FinDiff:
    """Supports ``FinDiff(axis, spacing, order, acc=2)`` and the mixed form
    ``FinDiff((0, d0, 1), (1, d1, 1), acc=2)``."""

    def __init__(self, *args, acc=2):
        if acc != 2:
            raise NotImplementedError("shim supports acc=2 only (model.yaml:13)")
        if args and isinstance(args[0], tuple):
            terms = list(args)
        else:
            axis, spacing, order = args
            terms = [(axis, spacing, order)]
        # per-axis (order, spacing); axes without a term get the identity
        self._axis_terms = {0: (0, 1.0), 1: (0, 1.0)}
        for axis, spacing, order in terms:
            self._axis_terms[axis] = (order, spacing)

    def _axis_stencil(self, axis, region):
        order, spacing = self._axis_terms[axis]
        table = _TABLES[(order, region)]
        s = spacing**order if order else 1.0
        return {off: c / s for off, c in table.items()}

    def stencil(self, shape):
        assert len(shape) == 2
        data = {}
        for r0 in ("L", "C", "H"):
            for r1 in ("L", "C", "H"):
                s0 = self._axis_stencil(0, r0)
                s1 = self._axis_stencil(1, r1)
                data[(r0, r1)] = {
                    (i, j): c0 * c1
                    for i, c0 in s0.items()
                    for j, c1 in s1.items()
                }
        return _Stencil(data)
