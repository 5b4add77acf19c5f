"""Test configuration: force JAX onto a virtual 8-device CPU backend.

Must run before the first `import jax` anywhere in the test session so
the platform flags take effect.

Set WEDETECT_TPU_TESTS=1 to keep the real TPU backend instead — only
the on-chip tests (tests/test_tpu_kernels.py) want that; everything
else is written for the virtual CPU mesh.
"""

import os
import sys

ON_TPU = os.environ.get("WEDETECT_TPU_TESTS") == "1"

if not ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize imports jax (registering the TPU "axon"
# backend) before conftest runs, so the env var alone is too late —
# override via the config API as well.
import jax  # noqa: E402

if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


def load_reference_standalone():
    """Import the reference's standalone model file as a module.

    Used ONLY to generate golden activations for parity tests — the
    reference implementation never ships in this package. torchvision
    is absent in this image, so it is stubbed before import (the model
    code only touches torchvision.ops.batched_nms, which the parity
    tests do not call).
    """
    import importlib.util
    import types

    if "torchvision" not in sys.modules:
        import importlib.machinery

        tv = types.ModuleType("torchvision")
        # a real ModuleSpec: transformers probes availability via
        # importlib.util.find_spec, which raises on __spec__ == None
        tv.__spec__ = importlib.machinery.ModuleSpec(
            "torchvision", None)
        tv.ops = types.SimpleNamespace(batched_nms=None)
        sys.modules["torchvision"] = tv
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    spec = importlib.util.spec_from_file_location(
        "_ref_standalone", os.path.join(REFERENCE_DIR,
                                        "generate_proposal.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Reset XLA's in-process caches after every test FILE.

    The monolithic full suite accumulates hundreds of compiled CPU
    executables in one process; past ~260 tests a later compile
    segfaults inside LLVM (deterministic position, passes in any
    shorter context — reproduced round 5 with the identical stack at
    test_ref_speculative twice). Dropping the caches at module
    boundaries keeps each file's compile environment close to its
    solo run (the validated per-file methodology, tools/run_suite.py)
    at the cost of cross-file cache reuse, which is tiny here.
    """
    yield
    import jax

    jax.clear_caches()
