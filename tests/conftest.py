"""Test configuration: force CPU with 8 virtual devices (sharding tests) and
f64 (reference-parity tolerances).

The CPU re-exec lives in tests/force_cpu.py (loaded via addopts before
pytest's capture starts); here we only finish the env setup for direct runs.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("FDAPDE_TPU_X64", "1")

import numpy as np
import pytest

REFERENCE_DATA = "/root/reference/test/data"
MESH_DIR = os.path.join(REFERENCE_DATA, "mesh")
MTX_DIR = os.path.join(REFERENCE_DATA, "mtx")


@pytest.fixture(scope="session")
def mesh_dir():
    return MESH_DIR


@pytest.fixture(scope="session")
def mtx_dir():
    return MTX_DIR


def load_mesh(name: str):
    """Load a reference test mesh by name (MeshLoader equivalent)."""
    from fdapde_core_tpu.geometry import LinearNetwork, Triangulation
    from fdapde_core_tpu.utils.io import load_mesh_csv

    points, elements, boundary = load_mesh_csv(os.path.join(MESH_DIR, name))
    if name == "network":
        return LinearNetwork(points, elements, boundary)
    return Triangulation(points, elements, boundary)


@pytest.fixture(scope="session")
def unit_square():
    return load_mesh("unit_square")


@pytest.fixture(scope="session")
def unit_sphere():
    return load_mesh("unit_sphere")


@pytest.fixture(scope="session")
def surface():
    return load_mesh("surface")


def reference_neighbors(name: str) -> np.ndarray:
    from fdapde_core_tpu.utils.io import read_csv

    raw = read_csv(os.path.join(MESH_DIR, name, "neigh.csv")).astype(np.int64)
    return np.where(raw > 0, raw - 1, -1)


def reference_edges(name: str) -> np.ndarray:
    from fdapde_core_tpu.utils.io import read_csv

    return read_csv(os.path.join(MESH_DIR, name, "edges.csv")).astype(np.int64) - 1
