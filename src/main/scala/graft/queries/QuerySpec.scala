package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark query over the testdata tables plus (when
  * SQL-expressible) a DuckDB oracle computing the identical result.
  *
  * Parity rules (FIXTURES.md §C / SURVEY.md §5) every spec obeys:
  *  - identical column NAMES and TYPES on both sides (the driver's
  *    compare is schema-sensitive: DuckDB count→BIGINT matches Spark
  *    count→long, but DuckDB sum(int)→HUGEINT or extract()→BIGINT must
  *    be cast to match Spark's int);
  *  - doubles from aggregations rounded (floating-point sums differ in
  *    the last ulp between engines; exact rational arithmetic like
  *    count ratios needs no rounding but gets it anyway);
  *  - timestamps emitted as formatted strings (Spark writes UTC-adjusted
  *    parquet timestamps, DuckDB naive ones — strings are unambiguous);
  *  - deterministic total ORDER BY with tie-breakers on both sides;
  *  - pivot value lists explicit and sorted.
  */
case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    bench: Boolean = false)

object Catalog {
  lazy val all: Seq[QuerySpec] =
    Relational.specs ++ MatrixPipelines.specs ++ DataOps.specs ++
      Advanced.specs ++ TrainingOps.specs ++ ScaleOps.specs ++
      CurationOps.specs ++ RetrievalOps.specs ++ StructureOps.specs ++
      SelectionOps.specs
}
