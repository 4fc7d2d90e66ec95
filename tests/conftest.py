"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective tests run
against XLA's host-platform device simulation instead (the TPU-native analog
of a fake distributed backend — SURVEY.md §4).  CPU is also the f64
correctness oracle for the FEM/solver gates (the attached TPU is a v5e with
no native f64).

NOTE: this environment force-loads jax at interpreter startup with
JAX_PLATFORMS=axon (a remote-TPU plugin), so setting env vars here is too
late for the import but still early enough for backend initialization; we
set both the env and the config explicitly.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_DIR = pathlib.Path("/root/reference")


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"
    yield


@pytest.fixture(scope="session")
def ys930_path() -> str:
    return str(REFERENCE_DIR / "xdmf_files" / "ys930_0.15000_triangle.xdmf")


@pytest.fixture(scope="session")
def ah93w145_path() -> str:
    return str(REFERENCE_DIR / "xdmf_files" / "ah93w145_0.14000_triangle.xdmf")
