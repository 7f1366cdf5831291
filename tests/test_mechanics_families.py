"""Scenario-family invariants for the mechanics data generator.

The diversified training mix (v2 data) must keep the OOD holdout meaningful:
training scenarios always have ONE contiguous clamped span and ONE point
load, while the level-2 families are exactly the held-out topologies (two
loads / pin+roller point supports / two full edges clamped). These tests pin
the invariants that make that split valid, plus the shard bookkeeping of
``generate_set`` (round-robin family alignment across --start-index shards).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

from physicsinformeddiffusionmodels_tpu.data.mechanics_generator import (
    IN_DIST_FAMILIES,
    OOD_FAMILIES,
    SCENARIO_FAMILIES,
    MechanicsFEM,
)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


@pytest.fixture(scope="module")
def fem():
    return MechanicsFEM(12)


def test_family_split_disjoint_and_complete():
    assert set(IN_DIST_FAMILIES).isdisjoint(OOD_FAMILIES)
    assert set(IN_DIST_FAMILIES) | set(OOD_FAMILIES) == set(SCENARIO_FAMILIES)


@pytest.mark.parametrize("fam", sorted(SCENARIO_FAMILIES))
def test_scenarios_are_solvable(fam, fem):
    """Load never lands on a fixed DOF, at least one support + one load, and
    the constrained system is solvable (no rigid-body modes)."""
    rng = np.random.default_rng(0)
    for _ in range(8):
        fixed, f = SCENARIO_FAMILIES[fam](fem, rng)
        nz = np.nonzero(f)[0]
        assert len(nz) > 0 and fixed.sum() >= 3
        assert not fixed[nz].any()
        E = np.full(fem.nels, 0.5)
        u = fem.solve(E, f, fixed)
        assert np.isfinite(u).all()
        assert float(f @ u) > 0.0  # positive compliance = stable structure


@pytest.mark.parametrize("fam", IN_DIST_FAMILIES)
def test_train_families_single_clamp_single_load(fam, fem):
    """Training invariant: one point load; clamped nodes form one contiguous
    span along a single edge (so two-load / point-support / two-edge OOD
    topologies stay unseen)."""
    nn = fem.nn
    edges = {
        "left": np.arange(nn) * nn,
        "right": np.arange(nn) * nn + (nn - 1),
        "bottom": np.arange(nn),
        "top": (nn - 1) * nn + np.arange(nn),
    }
    rng = np.random.default_rng(1)
    for _ in range(16):
        fixed, f = SCENARIO_FAMILIES[fam](fem, rng)
        load_nodes = np.unique(np.nonzero(f)[0] // 2)
        assert len(load_nodes) == 1
        clamped = np.unique(np.nonzero(fixed)[0] // 2)
        # fully clamped (both DOFs) everywhere
        assert fixed[2 * clamped].all() and fixed[2 * clamped + 1].all()
        # all clamped nodes lie on ONE edge, in one contiguous run
        on_edge = [
            e for e, nodes in edges.items()
            if np.isin(clamped, nodes).all()
        ]
        assert on_edge, f"{fam}: clamp spans multiple edges"
        pos = np.sort(np.searchsorted(edges[on_edge[0]], clamped))
        assert (np.diff(np.sort(pos)) == 1).all()


def test_generate_set_shards_align_round_robin(tmp_path):
    """A --start-index shard must continue the same global family round-robin
    and write scenarios_<start>.csv with global indices."""
    from generate_mechanics_sets import generate_set

    fem = MechanicsFEM(8)
    fams = IN_DIST_FAMILIES
    rng = np.random.default_rng(0)
    out = tmp_path / "fields"
    generate_set(fem, None, out, 4, 2, fams, (0.4, 0.5), rng, n_iter=2)
    generate_set(fem, None, out, 3, 2, fams, (0.4, 0.5), rng, n_iter=2,
                 start_index=4)
    files = sorted(p.name for p in out.glob("*.npy"))
    assert files == [f"{i}.npy" for i in range(7)]
    rows = (out / "scenarios.csv").read_text().strip().splitlines()[1:]
    rows += (out / "scenarios_4.csv").read_text().strip().splitlines()[1:]
    got = {int(r.split(",")[0]): r.split(",")[1] for r in rows}
    assert got == {i: fams[i % len(fams)] for i in range(7)}
    sample = np.load(out / "5.npy")
    assert sample.shape == (9, 9, 10) and np.isfinite(sample).all()


def test_merge_scenarios_folds_shards_into_main_csv(tmp_path):
    """After any shard finishes, scenarios.csv must carry the union of all
    shard rows sorted by index — consumers read only scenarios.csv."""
    from generate_mechanics_sets import generate_set

    fem = MechanicsFEM(8)
    fams = IN_DIST_FAMILIES
    rng = np.random.default_rng(0)
    out = tmp_path / "fields"
    generate_set(fem, None, out, 4, 2, fams, (0.4, 0.5), rng, n_iter=2)
    generate_set(fem, None, out, 3, 2, fams, (0.4, 0.5), rng, n_iter=2,
                 start_index=4)
    rows = (out / "scenarios.csv").read_text().strip().splitlines()[1:]
    got = {int(r.split(",")[0]): r.split(",")[1] for r in rows}
    assert got == {i: fams[i % len(fams)] for i in range(7)}
    # idempotent: re-merging changes nothing
    from generate_mechanics_sets import merge_scenarios
    before = (out / "scenarios.csv").read_text()
    merge_scenarios(out)
    assert (out / "scenarios.csv").read_text() == before
