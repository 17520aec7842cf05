from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from cc_dbp_spark.session import get_spark

    s = get_spark("cc-dbp-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir():
    from cc_dbp_spark import fixtures

    return fixtures.write_fixtures("/root/repo/.fixtures/n300", n_docs=300)


@pytest.fixture(scope="session")
def fixture_tables(fixture_dir):
    """Raw python-side fixture rows (for the oracle)."""
    import pyarrow.parquet as pq

    docs = pq.read_table(fixture_dir / "documents_spans.parquet").to_pylist()
    seeds = pq.read_table(fixture_dir / "seeds.parquet").to_pylist()
    robots = pq.read_table(fixture_dir / "robots_rules.parquet").to_pylist()
    return docs, seeds, robots
