"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding semantics are
validated on 8 virtual CPU devices (the SURVEY.md §4 test strategy). These
env vars must be set before jax is imported anywhere.
"""

import os
import sys

# Force-set: the machine presets JAX_PLATFORMS=axon (the TPU tunnel); tests
# must run on the virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache makes repeated test runs much faster. The
# path is keyed on the host's CPU-flags hash: XLA:CPU AOT entries embed the
# compiling machine's ISA features and SIGABRT when loaded on a different
# host (observed live after a host change), so each host gets its own dir.
import hashlib  # noqa: E402

try:
    with open("/proc/cpuinfo") as _f:
        _cpu_flags = next((ln for ln in _f if ln.startswith("flags")), "")
except OSError:
    _cpu_flags = ""
# The "-cpu" suffix keeps these entries apart from axon-session caches:
# under the axon platform, compiles run on a REMOTE host whose XLA:CPU AOT
# helper artifacts embed that machine's ISA — loading them locally
# SIGABRTs. One cache dir per (host fingerprint, jax platform).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    f"/tmp/jax_cache-{hashlib.md5(_cpu_flags.encode()).hexdigest()[:8]}-cpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

# The machine's sitecustomize imports jax at interpreter start (with
# JAX_PLATFORMS=axon captured); override the already-imported config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
