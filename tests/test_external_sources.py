"""Connector-stage registry coverage (reference SURVEY.md §2.B plugin
jars: Cassandra/Elasticsearch/MongoDB/SAS + Delta/Kafka). The stage
vocabulary must always parse; execution without the connector package
must raise an actionable hint naming the package."""

import pytest

from arc_jupyter_spark.plans.pipeline import STAGE_REGISTRY, parse_pipeline, run_pipeline

CONNECTOR_STAGES = [
    "CassandraExtract", "CassandraLoad",
    "ElasticsearchExtract", "ElasticsearchLoad",
    "MongoDBExtract", "MongoDBLoad",
    "SASExtract",
    "DeltaLakeExtract", "DeltaLakeLoad",
    "KafkaExtract", "KafkaLoad", "KafkaCommitExecute",
]


def test_connector_stages_registered():
    missing = [s for s in CONNECTOR_STAGES if s not in STAGE_REGISTRY]
    assert not missing, f"unregistered connector stages: {missing}"


def test_connector_stage_parses_from_hocon():
    stages = parse_pipeline(
        """
        {
          type = CassandraExtract
          name = read users
          outputView = cass_users
          options { keyspace = app, table = users }
        }
        """
    )
    assert stages[0].stage_type == "CassandraExtract"
    assert stages[0].options == {"keyspace": "app", "table": "users"}


@pytest.mark.parametrize("stage_type,package_hint", [
    ("CassandraExtract", "spark-cassandra-connector"),
    ("ElasticsearchExtract", "elasticsearch-spark"),
    ("MongoDBExtract", "mongo-spark-connector"),
    ("SASExtract", "spark-sas7bdat"),
])
def test_missing_connector_raises_package_hint(ctx, stage_type, package_hint):
    stages = parse_pipeline([{
        "type": stage_type, "name": "probe",
        "outputView": f"probe_{stage_type.lower()}",
        "inputURI": "/tmp/nonexistent",
    }])
    with pytest.raises(RuntimeError, match="not on the Spark classpath") as exc_info:
        run_pipeline(stages, ctx)
    assert package_hint in str(exc_info.value)
