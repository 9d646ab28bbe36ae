"""On-TPU test tier (VERDICT r1 item 3): compiled-mode Pallas kernels and
SNR-gated chains on the real chip. Unlike tests/, this directory does NOT
force the CPU backend — the ambient axon TPU registration stands.

Run with: ``python -m pytest tests_tpu -q``   (or ``pytest -m tpu``)
Skips itself entirely when no TPU is attached (e.g. CI containers) or when
the suite-wide CPU override is active (plain ``pytest`` from the root).
"""

import pytest


def pytest_collection_modifyitems(config, items):
    for item in items:
        item.add_marker(pytest.mark.tpu)


@pytest.fixture(scope="session", autouse=True)
def _require_tpu():
    import jax

    try:
        dev = jax.devices()[0]
    except Exception as e:  # backend init failure
        pytest.skip(f"no usable JAX backend: {e}")
    if "tpu" not in dev.platform.lower() and "axon" not in str(dev).lower():
        pytest.skip(f"TPU tier skipped: devices are {dev.platform!r}")
