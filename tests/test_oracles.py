"""Every registry query vs its DuckDB oracle (the driver's correctness gate,
mirrored locally at sf0.001 for speed; the driver runs sf0.01)."""

import os

import pytest

from anonymization_ray.queries import REGISTRY

from oracle_utils import assert_matches, duckdb_conn, to_pandas

SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, con):
    from anonymization_ray.util import retry_shuffle_race

    qd = REGISTRY[name]

    # retry_shuffle_race: absorb the documented Ray 2.49 hash-shuffle
    # schema-broadcast race (load-dependent, not data-dependent) the same
    # way the driver-facing registry wrapper in __ray_entry__ does
    @retry_shuffle_race
    def _run_and_compare():
        result = qd.fn(SF_DIR)
        if qd.sql is None:
            df = to_pandas(result)
            assert len(df) > 0
            return
        assert_matches(result, con, qd.sql, name)

    _run_and_compare()
