"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding/collective correctness is
validated on 8 virtual CPU devices (SURVEY.md section 2e TPU note).  The axon
sitecustomize registers the TPU backend at interpreter start and pins
``jax_platforms``, so we override it back to CPU here, before any test
imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in _flags:
    # loaded hosts can stagger collective thread arrival past the 40s default
    _flags = (_flags + " --xla_cpu_collective_call_terminate_timeout_seconds=600").strip()
os.environ["XLA_FLAGS"] = _flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
try:
    # default in-process CPU collectives busy-wait at the rendezvous; on an
    # oversubscribed host gloo (blocking) is orders of magnitude faster
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:
    pass
