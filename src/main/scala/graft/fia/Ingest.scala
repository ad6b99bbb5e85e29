package graft.fia

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** CSV ingest for raw FIA DataMart tables (`fia_load` analog,
  * `R/fia_load.R:8-11`): explicit schemas (no inference in production
  * paths), header CSVs named `{STATE}_{TABLE}.csv`, multiple states
  * unioned by glob. Readers tolerate extra columns — the schema lists
  * only what the pipeline reads (FIXTURES.md).
  */
object Ingest {

  val plotSchema: StructType = StructType(Seq(
    StructField("CN", LongType), StructField("INVYR", IntegerType),
    StructField("STATECD", IntegerType), StructField("UNITCD", IntegerType),
    StructField("COUNTYCD", IntegerType), StructField("PLOT", IntegerType),
    StructField("DESIGNCD", IntegerType), StructField("INTENSITY", IntegerType)))

  val plotgeomSchema: StructType = StructType(Seq(
    StructField("CN", LongType), StructField("INVYR", IntegerType),
    StructField("ECOSUBCD", StringType)))

  val condSchema: StructType = StructType(Seq(
    StructField("CN", LongType), StructField("PLT_CN", LongType),
    StructField("INVYR", IntegerType), StructField("STATECD", IntegerType),
    StructField("UNITCD", IntegerType), StructField("COUNTYCD", IntegerType),
    StructField("PLOT", IntegerType), StructField("CONDID", IntegerType),
    StructField("CONDPROP_UNADJ", DoubleType), StructField("PROP_BASIS", StringType),
    StructField("COND_STATUS_CD", IntegerType), StructField("STDORGCD", IntegerType)))

  val treeSchema: StructType = StructType(Seq(
    StructField("CN", LongType), StructField("PLT_CN", LongType),
    StructField("INVYR", IntegerType), StructField("STATECD", IntegerType),
    StructField("UNITCD", IntegerType), StructField("COUNTYCD", IntegerType),
    StructField("PLOT", IntegerType), StructField("SUBP", IntegerType),
    StructField("TREE", IntegerType), StructField("CONDID", IntegerType),
    StructField("MORTYR", IntegerType), StructField("STATUSCD", IntegerType),
    StructField("RECONCILECD", IntegerType), StructField("DECAYCD", IntegerType),
    StructField("STANDING_DEAD_CD", IntegerType), StructField("DIA", DoubleType),
    StructField("CR", DoubleType), StructField("HT", DoubleType),
    StructField("ACTUALHT", DoubleType), StructField("CULL", DoubleType),
    StructField("SPCD", IntegerType), StructField("TPA_UNADJ", DoubleType),
    StructField("CARBON_AG", DoubleType), StructField("DRYBIO_AG", DoubleType)))

  private val schemas = Map(
    "PLOT" -> plotSchema, "PLOTGEOM" -> plotgeomSchema,
    "COND" -> condSchema, "TREE" -> treeSchema)

  /** Read one table for the given states from `dir` (files
    * `{state}_{table}.csv`); missing optional columns read as null. */
  def loadTable(spark: SparkSession, dir: String, states: Seq[String], table: String): DataFrame = {
    val paths = states.map(st => s"$dir/${st}_$table.csv")
    spark.read
      .schema(schemas(table))
      .option("header", "true")
      .option("nullValue", "NA")
      .csv(paths: _*)
  }

  /** `fia_load` analog: the 4 live-path tables. */
  def load(spark: SparkSession, dir: String, states: Seq[String]): Map[String, DataFrame] =
    schemas.keys.map(t => t -> loadTable(spark, dir, states, t)).toMap
}
