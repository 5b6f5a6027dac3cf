"""Test config: force an 8-device virtual CPU mesh so engine/sharding
tests run fast and deterministically without the tunneled TPU (SURVEY.md
section 4 test plan).

Note: this environment's axon TPU plugin registers itself at interpreter
startup (sitecustomize) and overrides JAX_PLATFORMS with
jax.config.update('jax_platforms', 'axon,cpu'); env vars alone do NOT
switch the backend. Re-updating the config before any backend
initialization does.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
