import pytest


@pytest.fixture(scope="session")
def spark():
    from pdf_extractor_spark.session import get_spark
    return get_spark("pytest", master="local[4]", shuffle_partitions=4)


@pytest.fixture(scope="session")
def corpus_rows():
    from pdf_extractor_spark.gen import gen_corpus
    return gen_corpus(300, seed=42)


@pytest.fixture(scope="session")
def corpus_path(spark, corpus_rows, tmp_path_factory):
    from pdf_extractor_spark.operators.extraction import INPUT_SCHEMA
    p = str(tmp_path_factory.mktemp("corpus") / "documents")
    spark.createDataFrame(corpus_rows, schema=INPUT_SCHEMA).write.parquet(p)
    return p


@pytest.fixture(scope="session")
def golden(corpus_rows):
    from pdf_extractor_spark.oracle import run_oracle
    return run_oracle(corpus_rows)
