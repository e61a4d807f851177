"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated without TPU pod hardware by running on the
CPU backend with 8 virtual devices (the TPU-world standard for testing
multi-device code, see SURVEY.md §4).

Note: env-var-based overrides (``JAX_PLATFORMS`` / ``XLA_FLAGS``) do NOT work
here — the container's ``sitecustomize`` imports jax at interpreter startup
(before conftest) and registers the remote TPU backend, so jax has already
read the env. ``jax.config.update`` still works until the first backend
initialization, which is what we use.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
