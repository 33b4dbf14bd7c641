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
