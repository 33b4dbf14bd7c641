import numpy as np

from kfts_insar_spark.sources.dirlist import baselines_from_text, discover_pairs


def test_discover_pairs_from_dirnames(spark, tmp_path):
    for name in ("20240101_20240113", "20240113_20240125", "notapair"):
        d = tmp_path / name
        d.mkdir()
        (d / "data.bin").write_bytes(b"\x00" * 8)
    got = discover_pairs(spark, str(tmp_path) + "/*/").toPandas()
    assert len(got) == 2
    got = got.sort_values("t_minus_ord").reset_index(drop=True)
    assert str(got.loc[0, "date_minus"]) == "2024-01-01"
    assert str(got.loc[0, "date_plus"]) == "2024-01-13"
    assert int(got.loc[1, "t_plus_ord"]) - int(got.loc[1, "t_minus_ord"]) == 12


def test_baselines_from_text(spark, tmp_path):
    f = tmp_path / "baselines.txt"
    f.write_text("20240101 0.0\n20240113 -35.25\njunk line\n20240125 110\n")
    got = baselines_from_text(spark, str(f)).toPandas().sort_values("date")
    assert len(got) == 3
    np.testing.assert_allclose(got["baseline"].to_numpy(), [0.0, -35.25, 110.0])


def test_flat_raster_interleaves(spark, tmp_path):
    """BIL/BSQ/BIP stride decode equals the numpy ground truth for every
    interleave and channel (reference load_mmap, kf/utils/tsio.py:18-98)."""
    import numpy as np

    from kfts_insar_spark.sources.dirlist import read_flat_raster

    ny, nx, nch = 5, 7, 3
    rng = np.random.default_rng(11)
    cube = rng.normal(0, 10, (nch, ny, nx)).astype(np.float32)  # [band,y,x]

    d = tmp_path / "rasters"
    d.mkdir()
    # write the SAME cube in the three layouts
    (d / "a.bsq").write_bytes(cube.tobytes())
    (d / "a.bil").write_bytes(np.transpose(cube, (1, 0, 2)).tobytes())
    (d / "a.bip").write_bytes(np.transpose(cube, (1, 2, 0)).tobytes())

    for fmt, fname in (("BSQ", "a.bsq"), ("BIL", "a.bil"), ("BIP", "a.bip")):
        for channel in (1, 3):
            out = (
                read_flat_raster(
                    spark, str(d), nx, ny, interleave=fmt,
                    nchannels=nch, channel=channel, glob=fname,
                )
                .toPandas()
                .sort_values("y")
            )
            got = np.vstack(out["values"].to_numpy())
            np.testing.assert_allclose(
                got, cube[channel - 1].astype(np.float64), rtol=0, atol=0
            )

    # big-endian round trip
    (d / "b.bsq").write_bytes(cube.astype(">f4").tobytes())
    out = (
        read_flat_raster(
            spark, str(d), nx, ny, interleave="BSQ", nchannels=nch,
            channel=2, big_endian=True, glob="b.bsq",
        )
        .toPandas()
        .sort_values("y")
    )
    np.testing.assert_allclose(
        np.vstack(out["values"].to_numpy()), cube[1].astype(np.float64)
    )


def test_csv_sink_roundtrip(spark, tmp_path):
    """Text sink/source (SURVEY §2.1 S10): tier rows written as CSV with
    header read back value-identical (the reference's np.savetxt outputs,
    kf2rms.py / prepare_input.py text artifacts)."""
    from kfts_insar_spark.operators.rollup import rollup_raw
    from kfts_insar_spark.synth import sequences

    raw = rollup_raw(sequences(spark, 1000))
    out = str(tmp_path / "csv")
    raw.write.option("header", True).csv(out)
    back = (
        spark.read.option("header", True)
        .schema("source string, bucket_es long, n_docs long, sum_tok long, "
                "min_tok int, max_tok int")
        .csv(out)
    )
    a = sorted(tuple(r) for r in raw.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b and len(a) > 0


# ----------------------------------------------------------- NetCDF-3 (S5)
def test_netcdf3_roundtrip_and_spark_scan(spark, tmp_path):
    """S5: classic-format NetCDF grids read back bit-exact vs numpy ground
    truth, through the pure-numpy parser AND the Spark binaryFile scan
    (reference load_grd, kf/utils/tsio.py:141-165)."""
    import numpy as np

    from kfts_insar_spark.sources.netcdf3 import (
        read_grd_stack,
        read_var,
        write_netcdf3,
    )

    rng = np.random.default_rng(3)
    grids = {}
    for i in range(3):
        g = rng.normal(0, 5, (7, 11)).astype("f4" if i % 2 else "f8")
        grids[f"g{i}.grd"] = g
        write_netcdf3(str(tmp_path / f"g{i}.grd"), {"z": g})

    # direct parser: bit-exact per file
    for fname, g in grids.items():
        got = read_var(open(tmp_path / fname, "rb").read(), "z")
        assert got.shape == g.shape
        assert np.array_equal(got.astype(g.dtype), g)

    # Spark scan: every (file, y, x, value) row matches the source grid
    df = read_grd_stack(spark, str(tmp_path) + "/*.grd").toPandas()
    assert len(df) == sum(g.size for g in grids.values())
    for fname, g in grids.items():
        sub = df[df["file"] == fname]
        mat = np.full(g.shape, np.nan)
        mat[sub["y"].to_numpy(), sub["x"].to_numpy()] = sub["value"].to_numpy()
        assert np.array_equal(mat, g.astype(np.float64))

    # integer grid + 1-D variable + missing-var / HDF5 guards
    gi = np.arange(12, dtype="i4").reshape(3, 4)
    write_netcdf3(str(tmp_path / "int.grd"), {"z": gi})
    assert np.array_equal(
        read_var(open(tmp_path / "int.grd", "rb").read(), "z"), gi
    )
    import pytest as _pt

    with _pt.raises(KeyError):
        read_var(open(tmp_path / "int.grd", "rb").read(), "nope")
    with _pt.raises(ValueError):
        read_var(b"\x89HDF" + b"\0" * 64, "z")


def test_read_tolerates_manifest_without_schema(spark, tmp_path):
    """Pre-upgrade manifests (no write-time schema recorded) must still
    read via footer inference — the schema key is an optimization, not a
    requirement."""
    import json
    import os

    from pyspark.sql import functions as F

    from kfts_insar_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("pday")
    )
    sid = t.append(df, partition_by=["pday"])
    mpath = os.path.join(t.path, "manifests", f"{sid}.json")
    m = json.load(open(mpath))
    assert "schema" in m  # new manifests record it
    m.pop("schema")
    os.remove(mpath)
    json.dump(m, open(mpath, "w"))
    t._manifest_cache.clear()
    got = t.read(spark)
    assert got.count() == 10 and set(got.columns) == {"id", "pday"}
