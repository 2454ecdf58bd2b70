package graft.operators

import graft.core.ColumnRole
import org.apache.spark.sql.DataFrame

/** Stats-table side of the reference's report generation
  * (ref: data_report/basic_report_generation.py + report_preprocessing.py
  * — the datapane HTML/chart layer is out of engine scope per SURVEY.md;
  * the numbers that feed it are exactly these tables).
  */
object BasicReport {

  /** All descriptive/quality metric tables for a frame, keyed by section
    * name — the engine-side content of the reference's "basic report".
    */
  def generate(df: DataFrame, threshold: Double = 0.8): Map[String, DataFrame] = {
    val (num, cat, _) = ColumnRole.segregate(df.schema)
    val all = num ++ cat
    val base = Map(
      "global_summary" -> StatsGenerator.globalSummary(df),
      "measures_of_counts" -> StatsGenerator.measuresOfCounts(df, all),
      "measures_of_cardinality" -> StatsGenerator.measuresOfCardinality(df, all),
      "duplicate_detection" -> QualityChecker.duplicateDetection(df, all),
      "nullRows_detection" -> QualityChecker.nullRowsDetection(df, all),
      "IDness_detection" -> QualityChecker.idnessDetection(df, all, threshold),
      "biasedness_detection" -> QualityChecker.biasednessDetection(df, all, threshold))
    val numeric =
      if (num.isEmpty) Map.empty[String, DataFrame]
      else Map(
        "measures_of_centralTendency" -> StatsGenerator.centralTendency(df, num),
        "measures_of_dispersion" -> StatsGenerator.measuresOfDispersion(df, num),
        "measures_of_percentiles" -> StatsGenerator.measuresOfPercentiles(df, num),
        "measures_of_shape" -> StatsGenerator.measuresOfShape(df, num),
        "outlier_detection" -> QualityChecker.outlierDetection(df, num))
    val categorical =
      if (cat.isEmpty) Map.empty[String, DataFrame]
      else Map(
        "mode_computation" -> StatsGenerator.modeComputation(df, cat),
        "invalidEntries_detection" -> QualityChecker.invalidEntriesDetection(df, cat))
    base ++ numeric ++ categorical
  }
}
