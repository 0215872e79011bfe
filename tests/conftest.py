from __future__ import annotations

import pytest

from docrawl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="docrawl_spark_tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def plan_of():
    """Shared formatted-plan capture (one definition — plan-shape
    tests in multiple files use this instead of re-implementing the
    redirect_stdout dance)."""
    import io
    from contextlib import redirect_stdout

    def _capture(df, mode: str = "formatted") -> str:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode)
        return buf.getvalue()

    return _capture
