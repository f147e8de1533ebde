"""Test configuration: run everything on CPU with 8 virtual devices so every
mesh / pjit / ring-attention test runs single-process (SURVEY.md §4.3), and
Pallas kernels run in interpret mode."""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the real TPU
# tunnel, which tests must not touch (slow remote compiles, single chip).
# NOTE: sitecustomize registers the TPU plugin in every python process when
# PALLAS_AXON_POOL_IPS is set, and that registration *claims the chip* — a
# test process would then deadlock against any concurrent TPU job.  Tests
# must therefore be launched with PALLAS_AXON_POOL_IPS unset, e.g.:
#     PALLAS_AXON_POOL_IPS= python -m pytest tests/ -q
# (This file also clears it, but sitecustomize has already run by the time
# conftest imports — the env-var-at-launch form is the reliable one.)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
