import os

# Run all tests on a virtual 8-device CPU mesh so sharding code paths are
# exercised without TPU hardware.  The environment's axon sitecustomize
# force-registers the TPU platform and rewrites JAX_PLATFORMS, so the env
# var alone is not enough; jax.config wins if set before first backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
