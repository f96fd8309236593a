"""Round-4 verdict item 8: the 100-TB many-files read rehearsal.
A 512-shard pages directory must produce byte-identical pipeline
results to the few-shard layout, and a checkpointed flagship job
killed mid-manifest must resume off the manifest (drop_done path) to
the same final output as an uninterrupted run."""

import os

import pandas as pd
import pytest

from whitebox_geospatial_analysis_tools_ray.pipelines.pages_flagship import (
    pages_flagship)
from whitebox_geospatial_analysis_tools_ray.sources.pages import (
    generate_pages_dataset)
from whitebox_geospatial_analysis_tools_ray.stages.dedup import (
    pages_exact_dedup)

N = 8192          # small corpus, many shards: 512 files of 16 rows


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    base = tmp_path_factory.mktemp("pages")
    few = generate_pages_dataset(N, str(base / "few"),
                                 rows_per_shard=N // 4)
    many = generate_pages_dataset(N, str(base / "many"),
                                  rows_per_shard=N // 512)
    n_files = len([f for f in os.listdir(many) if f.endswith(".parquet")])
    assert n_files >= 512
    return few, many


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return (df[cols].sort_values(cols, kind="mergesort")
            .reset_index(drop=True))


def test_flagship_identical_across_shard_layouts(corpora):
    few, many = corpora
    a = _canon(pages_flagship(few).to_pandas())
    b = _canon(pages_flagship(many).to_pandas())
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_exact_dedup_identical_across_shard_layouts(corpora):
    few, many = corpora
    a = pages_exact_dedup(few).reset_index(drop=True)
    b = pages_exact_dedup(many).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_checkpointed_job_resumes_mid_manifest(corpora, tmp_path):
    """Simulated kill: commit a strict subset of tile partitions of the
    512-shard flagship output, then rerun the full job against the
    same out_dir — the drop_done manifest path must skip the committed
    partitions (their files untouched) and complete the rest to the
    exact uninterrupted result."""
    from whitebox_geospatial_analysis_tools_ray.state.checkpoint import (
        checkpointed_write, is_complete, read_checkpointed)

    _, many = corpora
    ds = pages_flagship(many)
    fresh_dir = str(tmp_path / "fresh")
    checkpointed_write(ds, fresh_dir, key="tile_id", stage="flagship")
    want = _canon(read_checkpointed(fresh_dir).to_pandas())

    part_dir = str(tmp_path / "killed")
    half = pages_flagship(many).filter(lambda r: r["tile_id"] % 2 == 0)
    checkpointed_write(half, part_dir, key="tile_id", stage="flagship")
    committed = {f: os.path.getmtime(os.path.join(part_dir, f))
                 for f in os.listdir(part_dir) if f.startswith("part-")}
    assert committed

    checkpointed_write(pages_flagship(many), part_dir, key="tile_id",
                       stage="flagship")
    assert is_complete(part_dir)
    got = _canon(read_checkpointed(part_dir).to_pandas())
    pd.testing.assert_frame_equal(got, want)
    # the committed partitions were skipped, not rewritten
    for f, mt in committed.items():
        assert os.path.getmtime(os.path.join(part_dir, f)) == mt
