"""
Test configuration: force the JAX CPU platform with 8 virtual devices so
multi-chip sharding (dp mesh, globally-gathered negatives) is exercised
without TPU hardware.

Note: this environment registers a TPU PJRT plugin from sitecustomize before
conftest runs, and that registration overrides the JAX_PLATFORMS env var —
`jax.config.update` after import is the reliable way to pin the cpu backend
(backends initialize lazily on first use, so this is early enough).

Suite wall-clock budget: keep the full run under ~15 minutes uncontended
on this 1-core host (warm .jax_cache). The big line items are the
caption e2e trainings (test_caption_e2e.py, all 5 architectures) and the
torch translator parity run (test_translator_parity.py); new tests
should prefer the tiny shapes in tests/helpers.py and module-scoped
fixtures so growth in coverage doesn't regress the suite every future
round depends on. (Reference points: 157 tests ~7-14 min uncontended,
~19 min under a concurrent torch A/B run.)
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# COOT_TPU_TESTS=1 leaves the default (real-chip) platform so the
# hardware-only tests (on-core PRNG paths) run; everything else pins cpu
if os.environ.get("COOT_TPU_TESTS", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

# persistent compilation cache (shared with bench.py's .jax_cache):
# repeated suite runs skip every unchanged jit compile, and duplicate
# programs across test modules hit the cache within one run
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
