"""Test configuration: force an 8-virtual-device CPU platform.

The reference has no tests at all (SURVEY.md §4); this suite is designed
from scratch.  Multi-chip sharding logic runs on a fake 8-device CPU mesh
(`xla_force_host_platform_device_count`) — the TPU-world equivalent of a
fake backend.  The sandbox's sitecustomize pre-imports jax and registers a
remote TPU platform, so we must both set XLA_FLAGS *and* override
``jax_platforms`` before any backend is initialized.
"""

import os

_FLAG = "--xla_force_host_platform_device_count=8"
if _FLAG not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _FLAG).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

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
