"""Worker-death fault tolerance: at 256-node scale, task loss is
routine — Ray must retry map tasks whose worker process dies (a system
failure, unlike an application exception) and the pipeline must
produce the same result. We simulate node loss with os._exit(1) inside
a map_batches task, once, keyed on a filesystem flag."""

import os

import pyarrow as pa
import pytest
import ray

from hg_dedup_ray.sources.webpages import write_webpages


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ft_pages")
    write_webpages(str(d), n_docs=300, seed=11, minlen=48, n_files=6)
    return str(d)


def test_map_batches_survives_worker_death(ray_session, tmp_path):
    flag = tmp_path / "died_once"

    def bomb(batch: pa.Table) -> pa.Table:
        # first task to arrive kills its worker AFTER setting the flag;
        # concurrent stragglers may die too — every death must be retried
        if not flag.exists():
            flag.write_text("x")
            os._exit(1)
        return batch

    ds = ray.data.range(200, override_num_blocks=8)
    out = ds.map_batches(bomb, batch_format="pyarrow").take_all()
    assert sorted(r["id"] for r in out) == list(range(200))
    assert flag.exists(), "the bomb never fired - test proved nothing"


def test_flagship_survives_worker_death(ray_session, tmp_path, pages_dir):
    """The full dedup journey, with one scan-stage worker killed."""
    from hg_dedup_ray.config import DedupConfig
    from hg_dedup_ray.pipelines.sa_dedup import dedup_dataset

    flag = tmp_path / "died_once"
    cfg = DedupConfig(minlen=48, num_partitions=4, mode="annotate")

    docs = ray.data.read_parquet(pages_dir)

    def bomb(batch: pa.Table) -> pa.Table:
        if not flag.exists():
            flag.write_text("x")
            os._exit(1)
        return batch

    got = dedup_dataset(docs.map_batches(bomb, batch_format="pyarrow"), cfg)
    want = dedup_dataset(ray.data.read_parquet(pages_dir), cfg)
    gp = got.to_pandas().sort_values("url").reset_index(drop=True)
    wp = want.to_pandas().sort_values("url").reset_index(drop=True)
    assert flag.exists()
    assert gp.equals(wp)
