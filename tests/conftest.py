"""Shared fixtures: one Ray session per pytest run; seeded data dirs."""

from __future__ import annotations

import os

import duckdb
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    yield ray
    # drop lingering Dataset/ObjectRef cycles BEFORE the raylet client
    # goes away — refs collected after shutdown segfault in _raylet.so
    import gc

    gc.collect()
    import time

    time.sleep(0.5)  # let Data executor threads drain their last refs
    ray.shutdown()
    gc.collect()


@pytest.fixture(scope="session")
def t1_dir() -> str:
    from gridfia_ray import fixtures

    return fixtures.ensure_fixture("t1")


@pytest.fixture(scope="session")
def t1png_dir() -> str:
    from gridfia_ray import fixtures

    return fixtures.ensure_fixture("t1png")


@pytest.fixture(scope="session")
def t1_meta(t1_dir):
    from gridfia_ray import fixtures

    return fixtures.fixture_meta("t1")


@pytest.fixture(scope="session")
def t1_catalog(t1_meta) -> list[str]:
    codes = sorted(s["species_code"] for s in t1_meta["species"] if s["species_code"] != "0000")
    return ["0000"] + codes


@pytest.fixture(scope="session")
def duck(t1_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW pixels AS SELECT * FROM read_parquet('{t1_dir}/pixels.parquet')")
    con.execute(
        f"CREATE VIEW pixel_zones AS SELECT * FROM read_parquet('{t1_dir}/pixel_zones.parquet')"
    )
    con.execute(f"CREATE VIEW plots AS SELECT * FROM read_parquet('{t1_dir}/plots.parquet')")
    yield con
    con.close()


@pytest.fixture(scope="session")
def t1_tiles(t1_dir) -> str:
    return os.path.join(t1_dir, "tiles")
