from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from kgspark.session import get_spark  # noqa: E402

SF_UNIT = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"
SF_BENCH = "/root/testdata/sf0.1"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: scale-tier gate (full oracle parity at sf0.1) — run with "
        "`KGSPARK_TEST_CPUS=16 python -m pytest -m slow -q`",
    )


def pytest_collection_modifyitems(config, items):
    # Slow tests run only when explicitly selected (-m slow / -m "... slow ..."):
    # the default suite stays the fast sf0.001 gate the driver re-runs.
    if "slow" in (config.option.markexpr or ""):
        return
    skip = pytest.mark.skip(reason="sf0.1 scale gate — run with `pytest -m slow`")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    # KGSPARK_TEST_CPUS widens the session for the sf0.1 slow gate
    # (default stays small so the fast gate doesn't oversubscribe the box).
    cpus = os.environ.get("KGSPARK_TEST_CPUS", "4")
    s = get_spark(
        app_name="kgspark-tests",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, 2 * int(cpus)),
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
