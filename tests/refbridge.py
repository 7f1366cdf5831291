"""Import bridge for executing the torch reference implementation in-process.

Puts the dependency shims (findiff/solidspy/einops_exts/
rotary_embedding_torch/torchvision) ahead of site-packages and the reference
checkout on sys.path, so ``src.residuals_darcy`` etc. import and run
unmodified. Used by tests/test_reference_parity.py and the baseline
measurement in bench tooling (VERDICT r1 items 1 and 3).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

SHIMS = Path(__file__).parent / "reference_shims"
REFERENCE = Path(os.environ.get("PIDM_REFERENCE_DIR", "/root/reference"))


def reference_available() -> bool:
    return (REFERENCE / "src" / "residuals_darcy.py").exists()


_installed = False


def install() -> None:
    """Make the reference's `src.*` modules importable (idempotent)."""
    global _installed
    if _installed:
        return
    os.environ.setdefault("MPLBACKEND", "Agg")
    for p in (str(SHIMS), str(REFERENCE)):
        if p not in sys.path:
            sys.path.insert(0, p)
    _installed = True


def import_reference(module: str):
    """Import e.g. 'src.residuals_darcy' from the reference checkout."""
    install()
    import importlib

    return importlib.import_module(module)
