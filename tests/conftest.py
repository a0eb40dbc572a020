"""Test configuration: force an 8-device virtual CPU mesh before jax import.

This emulates a v5e-8 slice on the host, so multi-chip sharding tests run
without TPU hardware (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon TPU plugin force-prepends itself to jax_platforms; override it
# before any device initialization so tests run on the virtual CPU mesh
jax.config.update("jax_platforms", "cpu")

import sys

import pytest

REFERENCE_DIR = "/root/reference/training"


def _install_ftfy_stub():
    """The image lacks ftfy; reference modules import it. ftfy.fix_text is an
    identity for the ASCII prompts used in tests, so stub it for parity runs."""
    import types
    if "ftfy" not in sys.modules:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s, **kw: s
        sys.modules["ftfy"] = stub
    if "pkg_resources" not in sys.modules:
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            import packaging
            stub = types.ModuleType("pkg_resources")
            stub.packaging = packaging
            import packaging.version  # noqa: F401
            sys.modules["pkg_resources"] = stub


@pytest.fixture(scope="session")
def reference_modules():
    """Import the PyTorch reference modules for golden-value parity tests.

    Skips if the read-only reference checkout is absent (the framework itself
    never depends on it).
    """
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference checkout not available")
    _install_ftfy_stub()
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import importlib
    mods = {}
    for name in [
        "VitaCLIP_text_encoder_utils",
        "VitaCLIP_text_encoder",
        "VitaCLIP_vision_encoder_utils",
        "VitaCLIP_vision_encoder",
        "loss_utils",
        "memory_head",
    ]:
        mods[name] = importlib.import_module(name)
    return mods
