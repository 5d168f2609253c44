from __future__ import annotations

import pathlib
import sys

import pytest

sys.path.insert(0, "/root/repo")

REF_TESTS = pathlib.Path("/root/reference/tests")


@pytest.fixture(scope="session")
def spark():
    from boilerplate_buster_spark.session import get_spark

    s = get_spark("bbs-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def load_dir_corpus_text(path: pathlib.Path) -> list[tuple[str, str]]:
    """[(doc_name, decoded_text)] sorted by filename."""
    from boilerplate_buster_spark.core.tokenize import decode_page_bytes

    return [(f.name, decode_page_bytes(f.read_bytes())) for f in sorted(path.iterdir())]
