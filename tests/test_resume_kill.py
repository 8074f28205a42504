"""F6 kill/restart resume test + salted aggregation equivalence under skew."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from clangd_to_neo4j_ray.sources.fixtures import generate_pages, write_pages_fixture
from clangd_to_neo4j_ray.state.checkpoint import StageCheckpoint


class _Boom(RuntimeError):
    pass


def test_resume_after_midrun_failure(tmp_path):
    """Simulated kill: the stage function raises while processing the 4th
    partition; a restart computes only the remaining partitions and the
    final outputs equal an uninterrupted run."""
    fx = generate_pages(120)
    pages = str(tmp_path / "pages")
    write_pages_fixture(fx, pages, num_files=6)

    calls = {"n": 0}

    def flaky(ds: ray.data.Dataset) -> ray.data.Dataset:
        calls["n"] += 1
        if calls["n"] == 4:
            raise _Boom("simulated kill")
        return ds.map_batches(
            lambda t: t.select(["url", "lang"]), batch_format="pyarrow"
        )

    ckpt = StageCheckpoint(str(tmp_path / "work"), "extract")
    with pytest.raises(_Boom):
        ckpt.run(pages, flaky)
    # 3 partitions completed before the crash; manifest persisted them
    done_before = set(ckpt.manifest)
    assert len(done_before) == 3

    # restart with a healthy fn: only the missing 3 are computed
    ckpt2 = StageCheckpoint(str(tmp_path / "work"), "extract")

    def healthy(ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(
            lambda t: t.select(["url", "lang"]), batch_format="pyarrow"
        )

    r = ckpt2.run(pages, healthy)
    assert set(r["skipped"]) == done_before
    assert len(r["computed"]) == 3

    # outputs equal a fresh, uninterrupted run
    ckpt3 = StageCheckpoint(str(tmp_path / "work_fresh"), "extract")
    ckpt3.run(pages, healthy)
    a = ckpt2.output_dataset().to_pandas().sort_values("url").reset_index(drop=True)
    b = ckpt3.output_dataset().to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_salted_group_sum_equals_plain_under_skew():
    from clangd_to_neo4j_ray.stages.shuffle import grouped_sum, salted_group_sum

    rng = np.random.RandomState(0)
    # heavy skew: 80% of rows share one key
    keys = np.where(rng.rand(20000) < 0.8, "head", rng.choice(list("abcdef"), 20000))
    df = pd.DataFrame({"k": keys, "v": rng.randint(0, 100, 20000)})
    ds = ray.data.from_pandas(df)
    plain = (
        grouped_sum(ds, ["k"], {"v": "s"})
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    salted = (
        salted_group_sum(ds, ["k"], {"v": "s"})
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, salted, check_dtype=False)
    exp = df.groupby("k", as_index=False)["v"].sum().rename(columns={"v": "s"})
    pd.testing.assert_frame_equal(
        plain, exp.sort_values("k").reset_index(drop=True), check_dtype=False
    )
