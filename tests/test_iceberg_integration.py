"""Iceberg integration contract (README "Iceberg integration" section).

The sandbox ships no Iceberg runtime/catalog, so the real-catalog tests
auto-skip unless SPARK_GRAFT_ICEBERG_CATALOG names a configured catalog
(set it on a cluster whose session has the Iceberg extensions + runtime
jar). What CAN run everywhere: the `iceberg:` path dispatch contract and
the parquet stand-in's schema enforcement.
"""

import os

import pytest

from cmc_knowledge_graph_text2ttl_spark.sources.pages import read_pages

CATALOG = os.environ.get("SPARK_GRAFT_ICEBERG_CATALOG")


def _iceberg_available(spark) -> bool:
    if not CATALOG:
        return False
    try:
        spark.sql(f"SHOW NAMESPACES IN {CATALOG}").collect()
        return True
    except Exception:
        return False


class TestDispatchContract:
    def test_iceberg_prefix_routes_to_iceberg_format(self, spark):
        """Without the runtime the iceberg: prefix must fail INSIDE the
        iceberg reader (format not found / catalog error), proving the
        dispatch — never fall back to parquet silently."""
        if _iceberg_available(spark):
            pytest.skip("real catalog present; covered by TestRealCatalog")
        with pytest.raises(Exception) as ex:
            read_pages(spark, "iceberg:nocat.db.pages").collect()
        msg = str(ex.value).lower()
        assert "iceberg" in msg or "data source" in msg or "catalog" in msg

    def test_parquet_standin_enforces_schema(self, spark, tmp_path):
        spark.range(3).selectExpr("cast(id as string) AS url").write.parquet(
            str(tmp_path / "bad")
        )
        with pytest.raises(ValueError, match="missing columns"):
            read_pages(spark, str(tmp_path / "bad"))


@pytest.mark.skipif(
    not CATALOG, reason="no Iceberg catalog configured (SPARK_GRAFT_ICEBERG_CATALOG)"
)
class TestRealCatalog:
    """Runs only on a cluster with the Iceberg extensions configured."""

    TABLE = None  # set in setup

    @pytest.fixture(autouse=True)
    def table(self, spark):
        if not _iceberg_available(spark):
            pytest.skip("catalog env var set but catalog not reachable")
        tbl = f"{CATALOG}.kg_it.pages_test"
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {CATALOG}.kg_it")
        spark.sql(
            f"CREATE OR REPLACE TABLE {tbl} "
            "(url string, warc_ts timestamp, html binary, text string, "
            "lang string) USING iceberg PARTITIONED BY (bucket(16, url))"
        )
        yield tbl
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")

    def test_roundtrip_and_dynamic_overwrite(self, spark, table):
        from cmc_knowledge_graph_text2ttl_spark.sources import synth_pages_df

        pages = synth_pages_df(spark, 100)
        pages.writeTo(table).overwritePartitions()
        got = read_pages(spark, f"iceberg:{table}")
        assert got.count() == 100
        # dynamic overwrite: rewriting the same rows must not duplicate
        pages.writeTo(table).overwritePartitions()
        assert read_pages(spark, f"iceberg:{table}").count() == 100

    def test_partition_pruning_visible_in_plan(self, spark, table):
        from cmc_knowledge_graph_text2ttl_spark.sources import synth_pages_df

        synth_pages_df(spark, 100).writeTo(table).overwritePartitions()
        plan = (
            read_pages(spark, f"iceberg:{table}")
            .filter("url = 'https://host1.example.org/p/1'")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "filters=" in plan or "pushed" in plan.lower()
