"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Multi-chip sharding is validated without TPU hardware by simulating 8 XLA
host devices (the JAX-native answer to "multi-node tests without a cluster";
SURVEY.md §4).  Must run before the first `import jax` anywhere in the test
session, hence the environment mutation at conftest import time.
"""

import os
import sys

# Force-set (not setdefault): the session environment exports
# JAX_PLATFORMS=axon for the real-TPU tunnel; tests must stay on CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
# Silence XLA's C++ ERROR-level logs (inherited by every CLI subprocess
# the tests spawn): on this rig each warm-compile-cache load emits a
# ~3 KB cpu_aot_loader machine-feature warning; dozens of loads flooded
# test subprocess stderr (and once deadlocked an undrained pipe at
# 64 KB — see test_cli.py's preemption drill).  FATAL still prints.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# Persistent compile cache for EVERY jit in the test session (and, via
# the exported env var, every CLI subprocess the tests spawn — cli.py
# honors an explicit JAX_COMPILATION_CACHE_DIR).  The suite's wall time
# is dominated by hundreds of mini-model step compiles on a 1-core
# host; the repo-local cache makes repeat runs hit warm executables.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the CPU platform"


FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


@pytest.fixture(scope="session")
def overfitting_json():
    import json

    with open(os.path.join(FIXTURE_DIR, "overfitting.json")) as f:
        return json.load(f)


@pytest.fixture(scope="session")
def encoder(overfitting_json):
    from situation_recognition_tpu.data.encoder import ImsituEncoder

    return ImsituEncoder(overfitting_json, verbose=False)


def make_synth_images(directory, names, sizes=None, seed=0):
    """Write smooth synthetic JPEGs (upsampled low-res noise — benign for
    resample-order parity) named after annotation keys."""
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(seed)
    sizes = sizes or [(256, 256)] * len(names)
    for name, (h, w) in zip(names, sizes):
        low = rng.integers(0, 255, size=(8, 8, 3), dtype=np.uint8)
        arr = np.asarray(Image.fromarray(low).resize((w, h), Image.BILINEAR))
        Image.fromarray(arr).save(os.path.join(str(directory), name),
                                  quality=95)
