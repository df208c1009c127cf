"""Test configuration: force an 8-device virtual CPU mesh.

The reference repo has no tests (SURVEY.md section 4); we build the test
pyramid it lacks.  All tests run on CPU with 8 virtual devices so that
pjit/shard_map sharding paths are exercised exactly as they would be on a TPU
slice, and so that golden-parity comparisons against torch run in full f32
(the TPU MXU would otherwise round through bf16).

Note: the harness image registers the remote-TPU backend from a
sitecustomize module at interpreter start, so jax is already imported by the
time this file runs; ``jax.config.update("jax_platforms", ...)`` still works
because backend *selection* is lazy until first use.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite is compile-dominated on this
# single-core box (mesh-sharded train steps, interpret-mode Pallas, torch
# goldens), and the CPU backend caches fine.  The XLA-internal AOT
# sub-caches are disabled: they embed compile-machine feature strings
# (+prefer-no-scatter/+prefer-no-gather) that trip a noisy loader warning
# on reload; the JAX-level cache alone gives the ~5x warm-run win.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SEI_TEST_CACHE_DIR", "/root/jaxcache_cpu_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
