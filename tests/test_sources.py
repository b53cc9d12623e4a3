"""IO surface: binaryFile load, local/parquet sinks, DDL data source."""

from __future__ import annotations

import os

import numpy as np
import pytest

from spark_ij_spark.datamodel import image_to_np
from spark_ij_spark.operators.images import create_empty_images
from spark_ij_spark.sources import codecs
from spark_ij_spark.sources.images import (
    ImageJDataSource,
    load_images,
    load_images_driver,
    load_images_locally,
    read_images_parquet,
    register_image_source,
    save_images_local,
    save_images_parquet,
)


def test_npy_codec_roundtrip():
    arr = np.arange(24, dtype=np.float32).reshape(2, 4, 3)
    b = codecs.encode_array(arr, ".npy")
    back = codecs.decode_bytes(b, "x.npy")
    np.testing.assert_array_equal(arr, back)


def test_jpeg_native_and_unknown_suffix_errors():
    """JPEG went native in round 9 (no PIL gate left in the image
    path): a truncated stream is a decode ValueError, not a stub
    NotImplementedError; unknown suffixes still fail clearly."""
    with pytest.raises(ValueError, match="JPEG"):
        codecs.decode_bytes(b"\xff\xd8\xff", "x.jpg")
    with pytest.raises(ValueError, match="unsupported"):
        codecs.decode_bytes(b"", "x.xyz")


def test_png_codec_roundtrip():
    arr = np.arange(48, dtype=np.uint8).reshape(6, 8)
    b = codecs.encode_array(arr, ".png")
    back = codecs.decode_bytes(b, "x.png")
    np.testing.assert_array_equal(back[:, :, 0], arr)


def test_tiff_codec_roundtrip():
    arr = np.arange(24, dtype=np.uint16).reshape(4, 6)
    back = codecs.decode_bytes(codecs.encode_array(arr, ".tif"), "x.tif")
    np.testing.assert_array_equal(back[:, :, 0], arr)


def test_save_load_roundtrip_local(spark, tmp_path):
    imgs = create_empty_images(spark, "img", 5, width=6, height=4, value_fn=lambda i: 7.5)
    out = str(tmp_path / "imgs")
    save_images_local(imgs, out, path_col="sample")
    files = sorted(os.listdir(out))
    assert len(files) == 5 and all(f.endswith(".npy") for f in files)

    back = load_images(spark, out, pattern="*.npy")
    rows = back.collect()
    assert len(rows) == 5
    for r in rows:
        arr = image_to_np(r.image)
        assert arr.shape == (4, 6, 1)
        assert float(arr.mean()) == 7.5
        assert r.image.log[0].optype == "LOAD"


def test_load_images_locally_explicit_paths(spark, tmp_path):
    imgs = create_empty_images(spark, "img", 3, width=3, height=2, value_fn=lambda i: 1.0)
    out = str(tmp_path / "imgs2")
    save_images_local(imgs, out, path_col="sample")
    paths = [os.path.join(out, f) for f in sorted(os.listdir(out))]
    back = load_images_locally(spark, paths, partitions=2)
    assert back.count() == 3
    assert {os.path.basename(r.path) for r in back.collect()} == {
        os.path.basename(p) for p in paths
    }


def test_save_load_roundtrip_png_distributed(spark, tmp_path):
    """End-to-end PNG through the executors: save_images_local encodes
    one .png per image (pure codec), load_images decodes them back via
    the binaryFile scan."""
    imgs = create_empty_images(spark, "img", 3, width=5, height=4, value_fn=lambda i: 0.0)
    from spark_ij_spark.operators.images import run_all

    u8 = run_all(imgs.withColumnRenamed("sample", "path"), "8-bit")
    out = str(tmp_path / "pngs")
    save_images_local(u8, out, suffix=".png")
    files = sorted(os.listdir(out))
    assert len(files) == 3 and all(f.endswith(".png") for f in files)
    back = load_images(spark, out, pattern="*.png")
    rows = back.collect()
    assert len(rows) == 3
    for r in rows:
        arr = image_to_np(r.image)
        assert arr.shape == (4, 5, 1) and arr.dtype.name == "uint8"


@pytest.mark.parametrize("parallel", [True, False])
def test_load_images_driver_small_data_path(spark, tmp_path, parallel):
    """Opt-in driver-side decode (scOps.scala:134-151): decodes on the
    driver, ships rows via createDataFrame; content + lineage intact."""
    imgs = create_empty_images(spark, "img", 3, width=4, height=2, value_fn=lambda i: 3.5)
    out = str(tmp_path / "imgs3")
    save_images_local(imgs, out, path_col="sample")
    paths = [os.path.join(out, f) for f in sorted(os.listdir(out))]
    back = load_images_driver(spark, paths, partitions=2, parallel=parallel)
    rows = back.collect()
    assert len(rows) == 3
    assert back.rdd.getNumPartitions() == 2
    for r in rows:
        arr = image_to_np(r.image)
        assert arr.shape == (2, 4, 1)
        assert float(arr.mean()) == 3.5
        assert r.image.log[0].optype == "LOAD"


def test_load_images_malformed_modes(spark, tmp_path):
    """Corrupt files: failfast raises, permissive nulls the image,
    dropmalformed removes the row."""
    imgs = create_empty_images(spark, "img", 2, width=3, height=2, value_fn=lambda i: 1.0)
    out = str(tmp_path / "mixed")
    save_images_local(imgs, out, suffix=".tif", path_col="sample")
    with open(os.path.join(out, "broken.tif"), "wb") as fh:
        fh.write(b"II*\x00 but not really")

    with pytest.raises(Exception):
        load_images(spark, out, pattern="*.tif").collect()

    perm = load_images(spark, out, pattern="*.tif", mode="permissive").collect()
    assert len(perm) == 3
    null_rows = [r for r in perm if r.image.dtype is None]
    assert len(null_rows) == 1 and null_rows[0].path.endswith("broken.tif")

    kept = load_images(spark, out, pattern="*.tif", mode="dropmalformed").collect()
    assert len(kept) == 2 and all(r.image.dtype is not None for r in kept)


def test_imagej_stream_source_incremental_batches(spark, tmp_path):
    """Directory-watch streaming read with a checkpointed file sink:
    files present at start arrive in the first run; restarting from the
    checkpoint after a new file lands decodes ONLY the new file (offset
    = file-listing high-water mark)."""
    register_image_source(spark)
    land = tmp_path / "landing"
    land.mkdir()
    sink = str(tmp_path / "sink")
    cp = str(tmp_path / "cp")
    imgs = create_empty_images(spark, "img", 2, width=3, height=2, value_fn=lambda i: 5.0)
    save_images_local(imgs, str(land), suffix=".npy", path_col="sample")

    def run_once():
        q = (
            spark.readStream.format("imagej")
            .option("path", str(land))
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(sink).count() == 2

    import numpy as np

    from spark_ij_spark.sources.codecs import encode_array

    with open(os.path.join(str(land), "late_arrival.npy"), "wb") as fh:
        fh.write(encode_array(np.full((2, 3), 7.0, dtype=np.float32)))
    run_once()
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 3  # exactly one new row — earlier files not re-read
    by_name = {os.path.basename(r.path): r for r in rows}
    assert "late_arrival.npy" in by_name
    arr = image_to_np(by_name["late_arrival.npy"].image)
    assert arr.shape == (2, 3, 1) and float(arr.mean()) == 7.0


def test_parquet_byte_sink_keeps_keys(spark, tmp_path):
    imgs = create_empty_images(spark, "img", 4, width=3, height=3, value_fn=lambda i: 2.0)
    out = str(tmp_path / "bytes.parquet")
    save_images_parquet(imgs, out, path_col="sample")
    back = read_images_parquet(spark, out)
    rows = {r.path: image_to_np(r.image) for r in back.collect()}
    assert len(rows) == 4  # names preserved (unlike reference caveat)
    for arr in rows.values():
        assert float(arr.mean()) == 2.0


@pytest.fixture(scope="module")
def imagej_source(spark):
    register_image_source(spark)
    return spark


def test_ddl_debug_simple_schema(imagej_source):
    spark = imagej_source
    df = (
        spark.read.format("imagej")
        .option("debug", "true")
        .option("count", "7")
        .load()
    )
    assert df.columns == ["path", "image"]
    rows = df.collect()
    assert len(rows) == 7
    vals = sorted(float(image_to_np(r.image).mean()) for r in rows)
    assert vals == [float(i) for i in range(7)]  # constant-i debug images


def test_ddl_abstract_wide_schema(imagej_source):
    spark = imagej_source
    df = (
        spark.read.format("imagej")
        .option("debug", "true")
        .option("count", "3")
        .option("table", "abstract")
        .option("width", "5")
        .option("height", "4")
        .load()
    )
    assert df.columns == [
        "path",
        "name",
        "parent",
        "fullpath",
        "width",
        "height",
        "slices",
        "image",
    ]
    r = df.orderBy("path").collect()[0]
    assert (r.width, r.height, r.slices) == (5, 4, 1)
    # metadata-only query never fails on pixel decode
    assert df.select("width").distinct().count() == 1


def test_ddl_create_temporary_view_sql(imagej_source):
    spark = imagej_source
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW DebugImages "
        "USING imagej OPTIONS (debug 'true', count '5', table 'simple')"
    )
    assert spark.sql("SELECT COUNT(*) c FROM DebugImages").collect()[0].c == 5
    names = [r.tableName for r in spark.sql("SHOW TABLES").collect()]
    assert any(n.lower() == "debugimages" for n in names)


def test_ddl_write_path_roundtrip(imagej_source, tmp_path):
    """df.write.format('imagej') → per-image files → read back equal."""
    spark = imagej_source
    src = (
        spark.read.format("imagej")
        .option("debug", "true")
        .option("count", "4")
        .load()
    )
    out = str(tmp_path / "written")
    src.write.format("imagej").option("path", out).mode("append").save()
    files = sorted(os.listdir(out))
    assert len(files) == 4 and all(f.endswith(".npy") for f in files)
    back = load_images(spark, out, pattern="*.npy")
    vals = sorted(float(image_to_np(r.image).mean()) for r in back.collect())
    assert vals == [0.0, 1.0, 2.0, 3.0]


def test_ddl_path_required_without_debug(imagej_source):
    spark = imagej_source
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises((Py4JJavaError, AnalysisException, Exception)):
        spark.read.format("imagej").load().collect()


def test_save_images_url_dispatch(spark, tmp_path):
    """'://' targets route to the keyed-parquet byte sink, bare paths
    to one-file-per-image local save (scOps.scala:251-256)."""
    from spark_ij_spark.sources.images import save_images

    imgs = create_empty_images(spark, "img", 3, width=3, height=2, value_fn=lambda i: 2.0)
    local = str(tmp_path / "plain")
    save_images(imgs, local, path_col="sample")
    assert sorted(os.listdir(local))[0].endswith(".npy")

    url = "file://" + str(tmp_path / "keyed")
    save_images(imgs, url, path_col="sample")
    back = read_images_parquet(spark, url)
    rows = back.collect()
    assert len(rows) == 3
    assert image_to_np(rows[0].image).shape == (2, 3, 1)


def test_ddl_abstract_table_reads_rgb_file(imagej_source, tmp_path):
    """An RGB file decodes to a 4D [h][w][1][3] array; the abstract
    table's dimension unpack must handle it (round-7 review: a 3-way
    shape unpack crashed on every RGB input), and lineage must carry
    the LOAD entry instead of an empty log."""
    import numpy as np

    from spark_ij_spark.sources.codecs import encode_array

    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    (tmp_path / "a.png").write_bytes(encode_array(rgb, ".png"))
    spark = imagej_source
    df = (
        spark.read.format("imagej")
        .option("table", "abstract")
        .option("path", str(tmp_path))
        .load()
    )
    r = df.collect()[0]
    assert (r.width, r.height, r.slices) == (3, 2, 1)
    assert [int(s) for s in r.image.shape] == [2, 3, 1, 3]
    assert len(r.image.log) == 1 and r.image.log[0].optype == "LOAD"


def test_ddl_reader_skips_marker_files_and_dirs(imagej_source, tmp_path):
    """'_SUCCESS' markers and subdirectories in the source directory
    must be skipped like the stream reader does — an unfiltered entry
    reaches decode_bytes and kills the scan."""
    import numpy as np

    from spark_ij_spark.sources.codecs import encode_array

    (tmp_path / "img.png").write_bytes(
        encode_array(np.zeros((2, 2), dtype=np.uint8), ".png")
    )
    (tmp_path / "_SUCCESS").write_bytes(b"")
    (tmp_path / "subdir").mkdir()
    spark = imagej_source
    df = spark.read.format("imagej").option("path", str(tmp_path)).load()
    assert df.count() == 1


def test_save_images_local_rejects_basename_collisions(spark, tmp_path):
    """'a/x' and 'b/x' map to the same output file; executor partitions
    would race on it (last write wins, one image silently lost) — the
    save must fail loudly instead (round-8 sources review)."""
    from pyspark.sql import functions as F

    imgs = create_empty_images(spark, "img", 2, width=2, height=2)
    clash = imgs.withColumn(
        "sample", F.expr("CASE WHEN sample LIKE '%0' THEN 'a/x.png' ELSE 'b/x.png' END")
    )
    with pytest.raises(ValueError, match="basename"):
        save_images_local(clash, str(tmp_path / "out"), path_col="sample")


def test_imagej_writer_overwrite_semantics(imagej_source, tmp_path):
    """mode('overwrite') clobbers per-file; any other mode refuses to
    replace an existing target instead of silently last-write-wins."""
    spark = imagej_source
    src = (
        spark.read.format("imagej")
        .option("debug", "true")
        .option("count", "2")
        .load()
    )
    out = str(tmp_path / "w")
    src.write.format("imagej").option("path", out).mode("append").save()
    first = sorted(os.listdir(out))
    # overwrite: same files land again without error
    src.write.format("imagej").option("path", out).mode("overwrite").save()
    assert sorted(os.listdir(out)) == first
    # append onto existing names must fail loudly, at driver-side
    # commit with nothing renamed into the target dir (the r8 per-file
    # exists() precheck also broke task retries; round-9 ADVICE)
    with pytest.raises(Exception, match="already exist"):
        src.write.format("imagej").option("path", out).mode("append").save()
    # the failed job left no partial writes or staging litter behind
    assert sorted(os.listdir(out)) == first


def test_imagej_stream_skips_subdirectories_and_keeps_lineage(spark, tmp_path):
    """A subdirectory in the landing dir (uploader temp dir) must not
    wedge the stream, and stream-loaded images must carry the same
    LOAD lineage entry as batch-loaded ones (round-8 sources review:
    the stream serializer hard-coded an empty log)."""
    register_image_source(spark)
    land = tmp_path / "landing"
    land.mkdir()
    (land / "tempdir").mkdir()  # must be skipped, not open()ed
    imgs = create_empty_images(spark, "img", 1, width=3, height=2)
    save_images_local(imgs, str(land), suffix=".npy", path_col="sample")
    sink = str(tmp_path / "sink")
    q = (
        spark.readStream.format("imagej")
        .option("path", str(land))
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 1
    log = rows[0].image.log
    assert len(log) == 1 and log[0].optype == "LOAD"


def test_imagej_writer_commit_rejects_cross_partition_collisions(
    imagej_source, tmp_path
):
    """Two input paths sharing an output basename must fail the job at
    driver-side commit with NOTHING moved into the target dir — the r8
    per-file exists() check was a check-then-write race that could let
    both partitions land before either noticed (round-9 ADVICE)."""
    from pyspark.sql import functions as F

    spark = imagej_source
    imgs = create_empty_images(spark, "img", 2, width=2, height=2)
    clash = imgs.select(
        F.expr(
            "CASE WHEN sample LIKE '%0' THEN 'a/x.png' ELSE 'b/x.png' END"
        ).alias("path"),
        F.col("image"),
    ).repartition(2, "path")
    out = str(tmp_path / "clash")
    with pytest.raises(Exception, match="basename"):
        clash.write.format("imagej").option("path", out).mode("append").save()
    assert not os.path.exists(out) or os.listdir(out) == []


def test_collision_precheck_catches_newline_basenames(spark, tmp_path):
    """'.' in the splitext-mirror regex must match newlines ((?s)) or a
    \\n inside a basename escapes the extension strip and the precheck
    misses a collision the writer still produces (round-9 review)."""
    from pyspark.sql import functions as F

    imgs = create_empty_images(spark, "img", 2, width=2, height=2)
    clash = imgs.withColumn(
        "sample",
        F.expr(
            "CASE WHEN sample LIKE '%0' THEN concat('a/x', char(10), 'y.png')"
            " ELSE concat('b/x', char(10), 'y.jpg') END"
        ),
    )
    with pytest.raises(ValueError, match="basename"):
        save_images_local(clash, str(tmp_path / "out"), path_col="sample")


def test_imagej_writer_staging_is_job_scoped(imagej_source, tmp_path):
    """Cleanup must only remove THIS job's staging root: a concurrent
    job's staged files under <path>/_temporary/<other-job> survive a
    commit (round-9 review: a shared rmtree deleted them)."""
    spark = imagej_source
    out = tmp_path / "w2"
    other = out / "_temporary" / "other-job-staging"
    other.mkdir(parents=True)
    (other / "staged.npy").write_bytes(b"concurrent job's staged bytes")
    src = (
        spark.read.format("imagej")
        .option("debug", "true")
        .option("count", "2")
        .load()
    )
    src.write.format("imagej").option("path", str(out)).mode("append").save()
    assert (other / "staged.npy").exists(), "concurrent staging deleted"
    assert len([f for f in os.listdir(out) if not f.startswith("_")]) == 2


def test_imagej_writer_commit_rolls_back_on_midloop_rename_failure(tmp_path):
    """A mid-loop os.replace failure must leave the TARGET free of any
    partially-committed files (already-renamed ones roll back to
    staging) and a subsequent abort() must PRESERVE the staging dir for
    recovery instead of deleting the only surviving copy (round-9
    ADVICE: partial commit + abort cleanup was unreconstructable)."""
    from spark_ij_spark.sources.images import ImageJWriter, _ImageJCommit

    out = tmp_path / "w3"
    out.mkdir()
    w = ImageJWriter({"path": str(out)}, overwrite=True)
    stage = tmp_path / "stage"
    stage.mkdir()
    (stage / "a.npy").write_bytes(b"payload-a")
    (stage / "b.npy").write_bytes(b"payload-b")
    # make the SECOND rename fail: target b.npy is a non-empty directory
    (out / "b.npy").mkdir()
    (out / "b.npy" / "block").write_bytes(b"x")
    with pytest.raises(OSError, match="commit failed mid-rename"):
        w.commit([_ImageJCommit(str(stage), ["a.npy", "b.npy"])])
    # a.npy was renamed first, then rolled back — target holds no files
    assert not (out / "a.npy").exists()
    assert (stage / "a.npy").read_bytes() == b"payload-a"
    assert (stage / "b.npy").read_bytes() == b"payload-b"
    # abort after the failed commit keeps staging intact
    w.abort([])
    assert (stage / "a.npy").exists() and (stage / "b.npy").exists()
