"""Test harness configuration.

Tests run on CPU with 8 simulated devices so that Pallas kernels run in
interpreter mode and multi-device sharding tests exercise real collectives
without TPU hardware (a capability the reference lacks entirely — its TP
tests require physical multi-GPU hosts, see SURVEY.md §4).

Set FLUTE_TPU_TEST_PLATFORM=tpu to run the suite against real hardware.
"""

import os

if os.environ.get("FLUTE_TPU_TEST_PLATFORM", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # jax may already be imported by a sitecustomize hook (which registers
    # a TPU PJRT plugin); the env var alone is then too late — update the
    # live config before any backend is initialized.
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
