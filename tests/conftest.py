import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from docling_spark.session import get_spark

    s = get_spark(app="docling_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_path(tmp_path_factory):
    """Deterministic 60-doc synthetic corpus parquet, shared by tests."""
    from docling_spark.synth import write_corpus_parquet

    path = str(tmp_path_factory.mktemp("corpus") / "documents.parquet")
    write_corpus_parquet(path, n_docs=60, seed=42)
    return path
