"""Test configuration: force an 8-device CPU mesh (SURVEY.md §4.5) and fp64.

Tests run on CPU so CI needs no TPU: the virtual 8-device platform exercises
every shard_map/psum path, and x64 gives a tight numerical oracle for the
analytic-vs-autodiff and Schur-vs-dense equivalence tests. The library itself
is dtype-polymorphic; TPU production runs are f32.

Note: this sandbox's sitecustomize imports jax and registers the remote "axon"
TPU backend before conftest runs, so env-var platform selection is too late —
``jax.config.update("jax_platforms", "cpu")`` is the override that works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
