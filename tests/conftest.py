"""Test configuration: force an 8-device virtual CPU mesh.

Distributed paths are tested without a pod by faking devices on CPU
(SURVEY.md §4.6; the XLA_FLAGS technique from SNIPPETS.md:74).

Note: this environment's sitecustomize registers the experimental `axon`
TPU plugin and sets ``jax.config.jax_platforms = "axon,cpu"`` directly, so
the JAX_PLATFORMS env var alone is NOT enough — we must override the config
after importing jax but before any backend is initialised.  Running the unit
suite against the tunneled single TPU chip would be both slow (per-dispatch
tunnel latency) and wrong for the 8-device mesh tests.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test MODULES.

    The r5 suite (~145 tests) accumulated enough live compiled programs in
    the single-process CPU client to segfault deterministically partway
    into tests/test_smc.py (reproduced twice at the same test; every
    sub-prefix of files passes in isolation).  Clearing per module keeps
    within-module jit reuse (the expensive shared programs are per-file)
    while bounding the client's live-executable set.
    """
    yield
    jax.clear_caches()
