"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4). Environment must be set before
jax is imported anywhere.
"""

import os
import sys

# stash the original TPU-tunnel trigger so the TPU-tier tests
# (tests/test_tpu_compiled.py) can restore it in their subprocesses
os.environ.setdefault("_SURYA_ORIG_POOL_IPS", os.environ.get("PALLAS_AXON_POOL_IPS", ""))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["PALLAS_AXON_POOL_IPS"] = ""  # for child processes
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("ALLOW_RANDOM_WEIGHTS", "true")

# The test suite (and every CLI subprocess it spawns) gets its OWN
# persistent-compilation-cache dir, separate from the user cache: sharing it
# let a killed test run leave a truncated artifact that poisoned later
# processes (reproduced in the round-3 review: test_cli.py before
# test_device_postprocess.py failed with "supplied 83 buffers but compiled
# program expected 86"). The dir is STABLE across runs (keyed by jax
# version) so repeat runs skip recompiles — safe now that cache writes are
# atomic (runtime._patch_atomic_cache_writes) and the separated-consts
# fastpath corruption is guarded; no test wipes the real cache dir.
import tempfile  # noqa: E402


def _test_cache_dir() -> str:
    # keyed by jax version AND host-CPU identity: XLA:CPU AOT artifacts embed
    # machine features, and a VM migration that changes the host CPU makes a
    # version-only dir serve wrong-machine artifacts ("could lead to SIGILL"
    # cpu_aot_loader errors on every program load)
    import jax.version

    from surya_tpu.common.runtime import _machine_fingerprint

    try:
        fp = _machine_fingerprint()
    except Exception:
        fp = "nofp"
    d = os.path.join(
        tempfile.gettempdir(), f"surya-test-jaxcache-{jax.version.__version__}-{fp}"
    )
    os.makedirs(d, exist_ok=True)
    return d


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _test_cache_dir())

# A TPU-tunnel plugin in this image (axon sitecustomize) force-selects its
# platform at interpreter start, silently ignoring JAX_PLATFORMS=cpu — tests
# would then run on the remote TPU in bf16 and fail exact-fp32 parity
# assertions. Counter-override before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# cache even quick-compiling programs: the suite compiles hundreds of small
# XLA:CPU programs (tiny-config predictors) whose compile time is individually
# below the 1s default threshold but collectively minutes on this 1-vCPU box
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)

# Stubs for deps the reference package imports but this image lacks
# (dotenv, pydantic_settings) — only used by the torch-parity tests that
# instantiate the reference models with random weights.
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "_stubs"))

# Decode budgets for the whole suite: chunked decode scans run their FULL
# static step count per dispatch regardless of active slots, and the task
# default budget is 224 tokens — at tiny-model/virtual-mesh execution speeds
# on this 1-cpu box that made decode loops dominate suite wall-clock. Tests
# that need specific budgets set these themselves.
os.environ.setdefault("RECOGNITION_MAX_TOKENS", "16")
os.environ.setdefault("RECOGNITION_DECODE_CHUNK", "16")
# layout/table AR loops run to their box cap with random weights (no EOS)
os.environ.setdefault("LAYOUT_MAX_BOXES", "16")
os.environ.setdefault("TABLE_REC_MAX_BOXES", "24")

import pytest  # noqa: E402
from PIL import Image, ImageDraw  # noqa: E402


@pytest.fixture(scope="session")
def test_image():
    image = Image.new("RGB", (1024, 1024), "white")
    draw = ImageDraw.Draw(image)
    draw.text((10, 10), "Hello World", fill="black", font_size=72)
    draw.text((10, 200), "This is a sentence of text.\nNow it is a paragraph.\nA three-line one.", fill="black", font_size=24)
    return image


@pytest.fixture(scope="session")
def test_image_tall():
    image = Image.new("RGB", (4096, 4096), "white")
    draw = ImageDraw.Draw(image)
    draw.text((10, 10), "Hello World", fill="black", font_size=72)
    draw.text((4000, 4000), "This is a sentence of text.", fill="black", font_size=24)
    return image
