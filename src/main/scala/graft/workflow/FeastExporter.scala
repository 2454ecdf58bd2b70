package graft.workflow

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Feature-store export (ref: feature_store/feast_exporter.py).
  * Adds the event/created timestamp columns and generates the Feast
  * feature-view definition source from the DataFrame schema (driver-side
  * string templating — same contract as feast_exporter.py:149-205).
  */
object FeastExporter {

  /** ref: feast_exporter.py:202-205 add_timestamp_columns. */
  def addTimestampColumns(
      df: DataFrame,
      eventTimeCol: String = "event_time",
      createdCol: String = "created"): DataFrame =
    df.withColumn(eventTimeCol, current_timestamp())
      .withColumn(createdCol, current_timestamp())

  private def feastType(dt: DataType): String = dt match {
    case LongType | IntegerType | ShortType | ByteType => "Int64"
    case DoubleType | FloatType => "Float64"
    case BooleanType => "Bool"
    case _: DecimalType => "Float64"
    case TimestampType | TimestampNTZType | DateType => "UnixTimestamp"
    case _ => "String"
  }

  /** Generate the feature-view python source for a frame's schema
    * (ref: feast_exporter.py:149-199 — same template structure).
    */
  def generateFeatureView(
      df: DataFrame,
      name: String,
      entityCol: String,
      sourcePath: String,
      ttlSeconds: Long = 86400L): String = {
    val fields = df.schema.fields
      .filterNot(f => Set(entityCol, "event_time", "created").contains(f.name))
      .map(f => s"""        Field(name="${f.name}", dtype=${feastType(f.dataType)}),""")
      .mkString("\n")
    s"""from datetime import timedelta
       |from feast import Entity, FeatureView, Field, FileSource
       |from feast.types import Bool, Float64, Int64, String, UnixTimestamp
       |
       |${name}_entity = Entity(name="$entityCol", join_keys=["$entityCol"])
       |
       |${name}_source = FileSource(
       |    path="$sourcePath",
       |    timestamp_field="event_time",
       |    created_timestamp_column="created",
       |)
       |
       |${name}_view = FeatureView(
       |    name="$name",
       |    entities=[${name}_entity],
       |    ttl=timedelta(seconds=$ttlSeconds),
       |    schema=[
       |$fields
       |    ],
       |    source=${name}_source,
       |)
       |""".stripMargin
  }

  /** The schema→Feast dtype mapping as a frame — one row per exported
    * field, exactly the fields/dtypes [[generateFeatureView]] templates
    * into the python source. Exposed so the mapping decision itself can
    * ride the oracle gate (DuckDB derives the same mapping from ITS view
    * of the parquet schema — a genuine cross-engine check that both
    * engines agree on every column's exported type).
    */
  def featureViewFields(df: DataFrame, entityCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.schema.fields
      .filterNot(f => Set(entityCol, "event_time", "created").contains(f.name))
      .map(f => (f.name, feastType(f.dataType))).toSeq
      .toDF("field", "dtype")
  }
}
