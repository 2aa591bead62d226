from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("fastparquet_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


@pytest.fixture()
def sample_table(rng) -> pa.Table:
    n = 3000
    def with_nulls(vals, typ, frac=0.07):
        mask = rng.random(n) < frac
        return pa.array([None if m else v for m, v in zip(mask, vals)], typ)

    return pa.table({
        "i32": with_nulls(rng.integers(-1000, 1000, n).tolist(), pa.int32()),
        "i64sorted": pa.array(np.sort(rng.integers(0, 10**12, n))),
        "f32": pa.array(rng.normal(size=n).astype(np.float32)),
        "f64": pa.array(np.where(rng.random(n) < 0.1, np.nan, rng.normal(size=n))),
        "lang": with_nulls(rng.choice(["py", "rs", "go", "cpp", "java"], n).tolist(), pa.string()),
        "text": pa.array([f"def fn_{i % 211}(x):\n    return x + {i}\n" for i in range(n)]),
        "flag": pa.array(rng.integers(0, 2, n).astype(bool)),
        "ts": pa.array(
            rng.integers(1_500_000_000_000_000, 1_700_000_000_000_000, n),
            pa.timestamp("us"),
        ),
    })
