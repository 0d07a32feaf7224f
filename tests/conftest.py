"""Test configuration.

Tests run on a virtual 8-device CPU mesh so sharding logic can be validated
without multi-chip hardware (the driver separately dry-runs the multi-chip
path). This must be set before JAX is imported anywhere.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# This image's sitecustomize force-registers the tunneled TPU platform; the
# env var alone is not enough to select the virtual-CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# The upstream reference checkout (read-only) provides golden fixtures:
# real genome FASTAs, prebuilt .skd/.skm databases and stdout snapshots.
REF_ROOT = Path(os.environ.get("SKETCHLIB_REF", "/root/reference"))
REF_IN = REF_ROOT / "tests" / "test_files_in"
REF_CORRECT = REF_ROOT / "tests" / "test_results_correct"

requires_reference = pytest.mark.skipif(
    not REF_IN.is_dir(), reason="reference fixture checkout not available"
)


@pytest.fixture
def ref_in():
    if not REF_IN.is_dir():
        pytest.skip("reference fixtures not available")
    return REF_IN


@pytest.fixture
def ref_correct():
    if not REF_CORRECT.is_dir():
        pytest.skip("reference fixtures not available")
    return REF_CORRECT
