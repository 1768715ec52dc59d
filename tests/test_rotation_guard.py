"""Ingest-time rotation rejection (VERDICT r3 item 7; SURVEY §1.1 row 3).

Parity deviation, documented: upstream georaster accepts rotated
geotransforms because GDAL's coordinate machinery resolves gt[2]/gt[4]
(georaster/georaster.py :: __Raster._load_ds ≈L150-180 ⚠ UNVERIFIED —
reference dir empty, cited per SURVEY §0 convention).  This engine's
extent/cell algebra is north-up by data model, so `with_cells` must
REJECT rot≠0 loudly instead of silently mis-registering — these tests
pin both halves of that contract:

* north-up rows (rot columns present but zero/NULL) ingest unchanged,
  bit-identical to a frame without the rot columns;
* any nonzero rotation coefficient fails the job with the documented
  message naming the offending image.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from georaster_spark.operators import georegister as geo


def _base_rows():
    return [
        ("img0000000001", 100.0, 900.0, 2.0, 2.0, 16, 16),
        ("img0000000002", 300.0, 700.0, 2.0, 2.0, 16, 16),
    ]


SCHEMA = "image_id string, gt_x0 double, gt_y0 double, gt_xres double, gt_yres double, w int, h int"


def test_north_up_rows_pass_unchanged(spark):
    plain = spark.createDataFrame(_base_rows(), SCHEMA)
    with_rot = (
        plain.withColumn("gt_rot0", F.lit(0.0))
        .withColumn("gt_rot1", F.lit(0.0))
    )
    a = geo.with_cells(plain).select("image_id", "cell_id", "cover_cells")
    b = geo.with_cells(with_rot).select("image_id", "cell_id", "cover_cells")
    assert a.collect() == b.collect()


def test_null_rotation_treated_as_north_up(spark):
    rows = [r + (None, None) for r in _base_rows()]
    df = spark.createDataFrame(rows, SCHEMA + ", gt_rot0 double, gt_rot1 double")
    out = geo.with_cells(df)
    assert out.count() == 2


@pytest.mark.parametrize("rot0,rot1", [(0.5, 0.0), (0.0, -0.25), (1.0, 1.0)])
def test_rotated_geotransform_rejected(spark, rot0, rot1):
    rows = [_base_rows()[0] + (rot0, rot1)]
    df = spark.createDataFrame(rows, SCHEMA + ", gt_rot0 double, gt_rot1 double")
    with pytest.raises(Exception, match="rotated geotransform unsupported"):
        geo.with_cells(df).select("cell_id").collect()


def test_rejection_names_the_offending_image(spark):
    rows = [
        _base_rows()[0] + (0.0, 0.0),
        _base_rows()[1] + (0.75, 0.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA + ", gt_rot0 double, gt_rot1 double")
    with pytest.raises(Exception, match="img0000000002"):
        geo.with_cells(df).select("cell_id").collect()
