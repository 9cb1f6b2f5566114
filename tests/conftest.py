"""Test configuration: run everything on a virtual 8-device CPU backend.

Sharding tests need multiple devices; the JAX-idiomatic fake backend is the
host platform with a forced device count. Must be set before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The env var alone is not enough under the axon TPU plugin; force via config.
jax.config.update("jax_platforms", "cpu")
# fp32-parity tests: force full-precision convolutions/matmuls.
jax.config.update("jax_default_matmul_precision", "highest")


# ---------------------------------------------------------------------------
# timeout fallback: when pytest-timeout (requirements.lock.txt) is absent,
# honor @pytest.mark.timeout(N) and --timeout=N ourselves via SIGALRM so a
# hung 2-process test (tests/test_multihost.py) can't stall the whole suite.
# ---------------------------------------------------------------------------
try:
    import pytest_timeout  # noqa: F401

    _HAVE_PLUGIN = True
except ImportError:
    _HAVE_PLUGIN = False

if not _HAVE_PLUGIN:
    import signal

    import pytest

    def pytest_addoption(parser):
        parser.addoption(
            "--timeout", type=float, default=None,
            help="per-test timeout in seconds (fallback for pytest-timeout)")

    def pytest_configure(config):
        config.addinivalue_line(
            "markers",
            "timeout(seconds): fail the test if it runs longer "
            "(SIGALRM fallback; install pytest-timeout for the real plugin)")

    @pytest.hookimpl(hookwrapper=True)
    def pytest_runtest_call(item):
        marker = item.get_closest_marker("timeout")
        seconds = (marker.args[0] if marker and marker.args
                   else item.config.getoption("--timeout", None))
        use_alarm = (seconds and hasattr(signal, "SIGALRM")
                     and signal.getsignal(signal.SIGALRM)
                     in (signal.SIG_DFL, signal.default_int_handler, None))
        if use_alarm:
            def _on_timeout(signum, frame):
                raise TimeoutError(
                    f"test exceeded {seconds}s timeout (conftest fallback)")

            old = signal.signal(signal.SIGALRM, _on_timeout)
            signal.alarm(int(seconds))
            try:
                yield
            finally:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, old)
        else:
            yield

