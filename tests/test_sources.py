"""Source/sink surfaces: CSV roundtrip (S1/S4), parquet sink (S2-S3),
config loading (S8)."""

from __future__ import annotations

import pytest

from prod2vec_spark.config import ConfigError, from_dict, from_yaml
from prod2vec_spark.sources.io import read_csv, read_table, write_csv, write_parquet


def test_csv_roundtrip(spark, tmp_path):
    part = read_table(spark, "/root/testdata/sf0.001", "part")
    path = str(tmp_path / "part_csv")
    write_csv(part.select("p_partkey", "p_name", "p_retailprice"), path, single_file=True)
    back = read_csv(spark, path, schema="p_partkey long, p_name string, p_retailprice double")
    assert back.count() == part.count()
    a = {r["p_partkey"]: r["p_name"] for r in back.collect()}
    b = {r["p_partkey"]: r["p_name"] for r in part.collect()}
    assert a == b


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    li = read_table(spark, "/root/testdata/sf0.001", "lineitem")
    path = str(tmp_path / "li_parq")
    write_parquet(li, path, partition_by=["l_returnflag"])
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    # partition pruning: filtering on the partition column prunes files
    one = back.filter(back["l_returnflag"] == "A")
    assert one.count() == li.filter(li["l_returnflag"] == "A").count()


def test_config_yaml_and_validation(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(
        """
sf_dir: /root/testdata/sf0.001
work_dir: /tmp/w
num_prods: 50
window_size: 3
train:
  vector_size: 16
  max_iter: 1
"""
    )
    cfg = from_yaml(str(p))
    assert cfg.num_prods == 50
    assert cfg.train.vector_size == 16

    with pytest.raises(ConfigError, match="unknown config keys"):
        from_dict({"sf_dir": "x", "work_dir": "y", "bogus": 1})
    with pytest.raises(ConfigError, match="num_prods"):
        from_dict({"sf_dir": "x", "work_dir": "y", "num_prods": 1})
    with pytest.raises(ConfigError, match="window_size"):
        from_dict({"sf_dir": "x", "work_dir": "y", "window_size": 0})
