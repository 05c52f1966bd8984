"""Test bootstrap: force an 8-device CPU mesh.

The environment's sitecustomize registers the axon TPU backend in every
process with jax_platforms="axon,cpu"; without the overrides below, tests
would silently run on the remote TPU tunnel (slow remote compiles). Tests run
on a virtual 8-device CPU mesh instead — the JAX analog of the reference's
mock-based distributed tests (SURVEY.md §4).
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
