package graft.etl

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The config-driven pipeline surface as an oracle-checked operator:
  * the ENTIRE dataflow below — source, filter, computed column,
  * projection, sort — is declared in a JSON document and assembled by
  * [[PipelineSpec]], never written as code. Proves spec-built plans are
  * the same Catalyst plans (pushdown, pruning, codegen) as hand-built
  * ones, matching the intent of the reference's declarative
  * `#[skopje::extract(...)]` design
  * (`/root/reference/skopje-macros/src/lib.rs:12-75`). */
object SpecQueries {

  private def pipelineSpec(spark: SparkSession, dir: String): DataFrame =
    PipelineSpec.frame(spark,
      s"""{"source": {"format": "parquet", "path": "$dir/lineitem.parquet"},
         | "transforms": [
         |   {"op": "filter", "expr": "l_quantity > 45"},
         |   {"op": "withColumn", "name": "rev",
         |    "expr": "l_extendedprice * (1 - l_discount)"},
         |   {"op": "select", "columns": ["l_orderkey", "l_linenumber", "rev"]},
         |   {"op": "sort", "columns": ["l_orderkey", "l_linenumber"]}
         | ]}""".stripMargin)

  val defs: Seq[QueryDef] = Seq(
    QueryDef("pipeline_spec", Some(
      """SELECT l_orderkey, l_linenumber,
        | l_extendedprice * (1 - l_discount) AS rev
        |FROM lineitem WHERE l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin), pipelineSpec)
  )
}
