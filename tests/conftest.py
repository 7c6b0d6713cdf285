from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distcpplus_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture()
def src_tree(tmp_path):
    """A small fixture tree: nested dirs, varied sizes, empty file."""
    src = tmp_path / "src"
    (src / "a" / "deep").mkdir(parents=True)
    (src / "b").mkdir()
    (src / "a" / "one.txt").write_bytes(b"x" * 1000)
    (src / "a" / "two.log").write_bytes(b"y" * 50)
    (src / "a" / "deep" / "three.txt").write_bytes(b"z" * 123456)
    (src / "b" / "four.txt").write_bytes(b"")
    (src / "five.txt").write_bytes(b"hello world")
    return str(src)
