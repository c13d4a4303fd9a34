"""Test configuration: force the CPU backend with a virtual 8-device mesh.

The dev container tunnels to a single real TPU chip ('axon' platform) with
high per-op latency; tests run on CPU for speed and to validate multi-chip
sharding on a virtual device mesh. Benchmarks (bench.py) use the real chip.
"""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SCENE_DIR = os.path.join(os.path.dirname(__file__), "..", "scenes")
