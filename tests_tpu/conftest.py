"""On-hardware kernel test gate (VERDICT r3 next #2).

Unlike tests/ (which forces an 8-device CPU mesh and x64 oracles), this
suite runs the production Pallas kernels ON THE REAL TPU CHIP and checks
them against high-precision CPU oracles. Round 2's
f32-stored-into-bf16-ref kernel bug was valid in CPU interpret mode and
invalid on hardware (BASELINE.md bf16 section) — this suite exists to
catch exactly that escape class.

Invocation (documented in BASELINE.md):

    python -m pytest tests_tpu/ -q          # on a machine with a TPU

The whole suite skips cleanly when no TPU backend is present (CI carries
it behind the same condition). x64 stays OFF globally (Mosaic kernels
don't lower under x64-on-TPU — see elementwise.is_fusible_chain); f64
oracles run inside `jax.experimental.enable_x64` scopes on the CPU
backend.
"""
import os

# Do NOT force a platform: we want the real TPU. But disable the
# persistent compile cache for determinism of measured behavior.
os.environ.setdefault("ENFLOWS_NO_COMPILE_CACHE", "1")

import jax  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    for item in items:
        item.add_marker(pytest.mark.tpu)


@pytest.fixture(scope="session", autouse=True)
def require_tpu():
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no TPU backend available — on-hardware suite "
                    f"(backend: {jax.default_backend()})",
                    allow_module_level=False)


@pytest.fixture(scope="session")
def cpu():
    return jax.devices("cpu")[0]
