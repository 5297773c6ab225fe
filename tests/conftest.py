from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from e02_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("e02-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(params=["local", "objectstore"])
def table_store(request, tmp_path):
    """Run the test against both metadata-store backends: the POSIX
    LocalFSStore default and the FakeObjectStore (S3 semantics: no hard
    links, conditional-put commits, idempotent deletes). Registered for
    this test's tmp_path only; yields the store (None = default local),
    so a test can also assert on the fake's primitive counts."""
    if request.param == "objectstore":
        from e02_spark.ops.store import (
            FakeObjectStore,
            register_store,
            unregister_store,
        )

        st = FakeObjectStore()
        register_store(str(tmp_path), st)
        yield st
        unregister_store(str(tmp_path))
    else:
        yield None
