"""Force tests onto an 8-device virtual CPU mesh (no TPU needed).

The container's sitecustomize registers the axon TPU backend and presets
JAX_PLATFORMS=axon before pytest starts, so plain env setdefault is too
late; override the jax config after import instead.

Set ``SVIEW_TEST_TPU=1`` to keep the real TPU backend — this enables the
``@pytest.mark.tpu`` tests (Mosaic-compiled stream kernel parity) and skips
nothing else; without a TPU those tests self-skip.
"""
import os

import pytest  # noqa: F401

if os.environ.get("SVIEW_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: runs the Mosaic-compiled path; needs a real TPU "
        "(SVIEW_TEST_TPU=1) or self-skips")


# modules whose tests genuinely need a multi-device mesh (the virtual
# 8-device CPU mesh in the default mode); on a 1-chip real backend they
# would truncate to 1 device and stop testing what they claim to
_MULTIDEV_FILES = ("test_parallel", "test_range_shard")
_MULTIDEV_TESTS = ("test_wide_range_sharded",)


def pytest_collection_modifyitems(config, items):
    """In SVIEW_TEST_TPU mode the virtual 8-device CPU mesh is NOT set up.
    Run the whole single-device surface (oracle matrix, device engines,
    Mosaic-compiled stream/pair kernels) on the real chip; skip only the
    tests that need a multi-device mesh (make_mesh truncates silently
    instead of failing, so they would silently under-test)."""
    if os.environ.get("SVIEW_TEST_TPU") != "1":
        return
    import jax

    if len(jax.devices()) >= 8:
        return
    skip = pytest.mark.skip(
        reason="SVIEW_TEST_TPU=1 with < 8 devices: needs a multi-device mesh")
    for item in items:
        mod = item.module.__name__ if item.module else ""
        if (any(mod.endswith(f) for f in _MULTIDEV_FILES)
                or any(item.name.startswith(t) for t in _MULTIDEV_TESTS)):
            item.add_marker(skip)
