"""Task-failure fault injection: with `retry_exceptions=True` Ray Data
re-dispatches a failed map task, and the engine's pipeline shapes
(stateless map_batches stages, sort-based folds) must produce EXACT
results when tasks die mid-run — the property that makes the 100-TB
story honest (a lost task costs one retry, not a wrong answer).

Injection: the first task to atomically create a GLOBAL /tmp marker
raises (exactly one failure per test; the retry and every other task
pass). The stage is stateless, so the retry recomputes the identical
batch — the same contract every production stage in this repo keeps
(content-hash shard sinks make even the WRITE stages retry-idempotent)."""

import os
import tempfile
import uuid

import numpy as np
import pyarrow as pa
import ray.data as rd


def _die_once_fn(marker: str):
    def flaky(b: pa.Table) -> pa.Table:
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            raise RuntimeError("injected task failure")
        except FileExistsError:
            pass
        v = b.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {"v": b.column("v"), "dbl": pa.array(v * 2, pa.int64())}
        )

    return flaky


def _marker():
    return os.path.join(tempfile.gettempdir(), f"die_once_{uuid.uuid4().hex}")


def test_map_stage_survives_injected_task_failure(ray_session):
    marker = _marker()
    ds = rd.from_arrow(
        pa.table({"v": pa.array(np.arange(1000), pa.int64())})
    ).repartition(8)
    got = (
        ds.map_batches(
            _die_once_fn(marker), batch_format="pyarrow",
            retry_exceptions=True,
        )
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    assert len(got) == 1000
    assert (got.dbl.values == got.v.values * 2).all()
    assert os.path.exists(marker)  # the failure actually fired


def test_sort_fold_exact_after_injected_task_failure(ray_session):
    """The engine's core no-groupby fold (min_per_key) downstream of the
    flaky stage still matches driver-side ground truth."""
    from anonymization_ray.util import min_per_key

    marker = _marker()
    ds = rd.from_arrow(
        pa.table({"v": pa.array(np.arange(600), pa.int64())})
    ).repartition(6)
    flaky = ds.map_batches(
        _die_once_fn(marker), batch_format="pyarrow", retry_exceptions=True
    ).map_batches(
        lambda b: pa.table(
            {
                "k": pa.array(
                    b.column("v").to_numpy(zero_copy_only=False) % 37,
                    pa.int64(),
                ),
                "dv": pa.array(
                    (b.column("v").to_numpy(zero_copy_only=False) * 7919)
                    % 1000 * 2,
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    got = {
        int(r["k"]): int(r["dv"])
        for r in min_per_key(flaky, "k", "dv").take_all()
    }
    keys = np.arange(600) % 37
    vals = (np.arange(600) * 7919) % 1000
    want = {int(k): int(min(2 * vals[keys == k])) for k in set(keys.tolist())}
    assert got == want
    assert os.path.exists(marker)


def test_write_stage_retry_idempotent(ray_session, tmp_path):
    """Content-hash shard sinks rewrite identical bytes on retry: a sink
    run twice (the worst-case double-execution of a retried write task)
    leaves exactly one file set."""
    from anonymization_ray.sources.arrowfmt import write_feather_shards

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(50), pa.int64()),
                "text": pa.array([f"t{i}" for i in range(50)]),
            }
        )
    )
    out = str(tmp_path / "shards")
    m1 = write_feather_shards(docs, out)
    m2 = write_feather_shards(docs, out)
    assert sorted(m1.column("path").to_pylist()) == sorted(
        m2.column("path").to_pylist()
    )
    assert len(os.listdir(out)) == m1.num_rows
