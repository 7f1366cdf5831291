"""Minimal ``solidspy`` stand-in (element stiffness only) for executing the
reference implementation (`/root/reference/src/residuals_mechanics_K.py:5,99-103`)."""
