"""Multimodal plumbing: schema, Arrow batching, deterministic fake
kernels, NotImplementedError gates for real codecs."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from jaccard_join_duckdb_spark.sources.multimodal import (
    ASSET_SCHEMA,
    decode_image_meta,
    extract_features,
    make_asset_table,
    sample_frames,
)


@pytest.fixture(scope="module")
def assets(documents):
    return make_asset_table(documents.limit(50), "doc_id", "text").cache()


def test_asset_schema(assets):
    got = [(f.name, f.dataType.simpleString()) for f in assets.schema.fields]
    want = [(f.name, f.dataType.simpleString()) for f in ASSET_SCHEMA.fields]
    assert got == want
    assert assets.count() == 50


def test_decode_deterministic(assets):
    a = sorted(map(tuple, decode_image_meta(assets).collect()))
    b = sorted(map(tuple, decode_image_meta(assets).collect()))
    assert a == b
    for row in a:
        _, w, h, c, n = row
        assert 16 <= w < 256 and 16 <= h < 256 and 1 <= c <= 4 and n > 0


def test_features_shape(assets):
    out = extract_features(assets)
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r.feature) == 16
        assert all(-1.0 <= x < 1.0 for x in r.feature)


def test_frame_sampling(assets):
    out = sample_frames(assets, every_n=20)
    grp = out.groupBy("asset_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert len(grp) == 50
    assert all(r.n >= 1 for r in grp)


def test_real_decode_gated(assets):
    with pytest.raises(PythonException, match="NotImplementedError"):
        decode_image_meta(assets, fake=False).collect()
