"""annotate_dataset: all original columns preserved; annotations equal
the flagship's; remove mode excises correctly."""

import numpy as np
import pandas as pd
import pytest

import ray

from hg_dedup_ray.config import DedupConfig
from hg_dedup_ray.pipelines.annotate import annotate_dataset
from hg_dedup_ray.pipelines.sa_dedup import dedup_dataset
from hg_dedup_ray.sources.webpages import write_webpages


@pytest.fixture(scope="module")
def pages(tmp_path_factory):
    d = tmp_path_factory.mktemp("annotate_pages")
    write_webpages(str(d), n_docs=250, seed=21, minlen=48, n_files=4)
    return str(d)


CFG = dict(minlen=48, num_partitions=3, shingle_k=8)


def test_annotate_preserves_all_columns(ray_session, pages):
    ds = ray.data.read_parquet(pages)
    cfg = DedupConfig(**CFG)
    out = annotate_dataset(ds, cfg).to_pandas().sort_values("doc_seq")
    src = ray.data.read_parquet(pages).to_pandas().sort_values("doc_seq")
    for col in ("url", "warc_ts", "html", "text", "lang", "doc_seq"):
        assert col in out.columns, col
        a = out[col].reset_index(drop=True)
        b = src[col].reset_index(drop=True)
        assert a.equals(b), col

    # annotations equal the flagship pipeline's
    flag = (
        dedup_dataset(ray.data.read_parquet(pages, columns=["url", "doc_seq", "text"]), cfg)
        .to_pandas().sort_values("doc_seq").reset_index(drop=True)
    )
    assert (
        out["n_removed_bytes"].reset_index(drop=True)
        == flag["n_removed_bytes"]
    ).all()
    assert (
        out["cluster_id"].reset_index(drop=True).astype("int64")
        == flag["cluster_id"].astype("int64")
    ).all()
    assert out["n_removed_bytes"].sum() > 0


def test_annotate_remove_mode(ray_session, pages):
    ds = ray.data.read_parquet(pages)
    cfg = DedupConfig(**CFG)
    out = annotate_dataset(ds, cfg, mode="remove").to_pandas().sort_values("doc_seq")
    for _, row in out.iterrows():
        want = len(row["text"].encode()) - int(row["n_removed_bytes"])
        assert len(row["text_deduped"].encode()) == want
