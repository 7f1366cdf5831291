"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This is the standard JAX way to exercise shard_map/pjit data-parallel code
without a real TPU slice (SURVEY.md §4e). Must be set before jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import jax

# The container's sitecustomize registers the axon TPU backend with explicit
# priority, overriding the env var — force CPU through the config API.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def golden_diff_dict():
    return dict(np.load(FIXTURES / "golden_diff_dict_T100.npz"))


@pytest.fixture(scope="session")
def golden_ops():
    return dict(np.load(FIXTURES / "golden_ops_T100.npz"))
