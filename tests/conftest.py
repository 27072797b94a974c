"""Test configuration: force an 8-virtual-device CPU platform.

The reference has no tests at all (SURVEY.md §4); this suite is designed
from scratch.  Multi-chip sharding logic runs on a fake 8-device CPU mesh
(`xla_force_host_platform_device_count`) — the TPU-world equivalent of a
fake backend.  The sandbox's sitecustomize pre-imports jax and registers a
remote TPU platform, so we must both set XLA_FLAGS *and* override
``jax_platforms`` before any backend is initialized.
"""

import os

# Single-thread Eigen + generous collective timeouts: XLA:CPU's in-process
# collective rendezvous blocks shared Eigen-pool workers, and a device whose
# multi-threaded conv subtasks queue behind those blocked workers can starve
# (observed fatal: "Termination timeout ... only 6 of 8 arrived").  Single-
# threaded compute always drains on the last free worker, so every device
# reaches the rendezvous.  CPU-test-only; real-TPU runs never see this.
_FLAGS = (
    "--xla_force_host_platform_device_count=8",
    "--xla_cpu_multi_thread_eigen=false",
    "--xla_cpu_collective_call_warn_stuck_timeout_seconds=60",
    "--xla_cpu_collective_call_terminate_timeout_seconds=600",
)
_have = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = " ".join(
    (_have,) + tuple(f for f in _FLAGS if f.split("=")[0] not in _have)).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: the suite is ~90% XLA compile time (the
# mesh train-step alone is minutes on a 1-core host); repeat runs reuse
# every compile ≥2 s.  Keyed by HLO+flags hash, so stale hits are
# impossible — a code change that alters any HLO recompiles just that HLO.
from dis_yolo_tpu.utils.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from dis_yolo_tpu.config import DISYoloConfig  # noqa: E402


@pytest.fixture(scope="session")
def small_cfg() -> DISYoloConfig:
    """Tiny config for fast CPU tests: 96px input -> grids 12/6/3, S=48."""
    return DISYoloConfig(image_size=96, test_size=96, batch_size=2,
                         pre_nms_top_k=64)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
