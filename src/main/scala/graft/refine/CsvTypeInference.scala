package graft.refine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, TimeFunctions}

/** Two-pass CSV/JSON type inference — the reference's most distinctive
  * algorithm (resources/convertors/csv_to_parquet.py:52-202), re-expressed as
  * a profiling aggregate + a cast projection.
  *
  * Reference semantics preserved exactly:
  *  - input columns are all-string (read with inferSchema=false);
  *  - the token set {NA, N/A, NULL, null, na, n/a, None, NONE, -, ""} is null
  *    (csv_to_parquet.py:30);
  *  - numeric candidates are cleaned of whitespace/thousands separators,
  *    currency symbols and % before parsing (csv_to_parquet.py:33-49);
  *  - a column becomes integer/double when >= 90 % of its non-null values
  *    parse (csv_to_parquet.py:137); integer only if ALL parsed values are
  *    integral;
  *  - a column becomes an ISO-8601-normalized date STRING (never a native
  *    timestamp) when >= 50 % of non-null values parse as dates
  *    (csv_to_parquet.py:179), UNLESS a majority of values are time-only
  *    strings (csv_to_parquet.py:162-169 guard);
  *  - everything else stays string.
  *
  * Scale design: pass 1 is ONE aggregate over the data (all per-column
  * ratios computed in a single partial/final agg — no per-column jobs); pass
  * 2 is a pure projection. Both are whole-stage-codegen'd; nothing is
  * collected to the driver except the tiny ratio row.
  */
object CsvTypeInference {

  val NumericThreshold = 0.90
  val DateThreshold = 0.50

  /** Inferred type decision for one column. */
  sealed trait Decision
  case object AsLong extends Decision
  case object AsDouble extends Decision
  case object AsIsoDate extends Decision
  case object AsString extends Decision

  private def nn(c: Column): Column = TextFunctions.nullifyTokens(c)

  /** Column ref robust to dots in names (json_normalize emits dotted keys). */
  private def colRef(name: String): Column =
    col(s"`${name.replace("`", "``")}`")

  /** A cleaned numeric candidate: null unless the cleaned string is a full
    * number (optionally signed, optional decimal part, optional exponent). */
  private def numericCandidate(c: Column): Column = {
    val cleaned = TextFunctions.numericClean(c)
    when(cleaned.rlike("^[+-]?((\\d+(\\.\\d*)?)|(\\.\\d+))([eE][+-]?\\d+)?$"),
      cleaned.cast("double"))
  }

  private def isTimeOnly(c: Column): Column =
    trim(c).rlike("^\\d{1,2}:\\d{2}(:\\d{2}(\\.\\d+)?)?$")

  /** Pass 1: one aggregate computing, per column: non-null count, numeric
    * parse count, integral count, date parse count, time-only count. */
  def profile(df: DataFrame, cols: Seq[String]): Map[String, Decision] = {
    if (cols.isEmpty) return Map.empty
    val aggs = cols.flatMap { name =>
      val c = nn(colRef(name))
      val num = numericCandidate(c)
      Seq(
        count(c).as(s"__nn_$name"),
        count(num).as(s"__num_$name"),
        count(when(num === num.cast("long").cast("double"), 1)).as(s"__int_$name"),
        count(when(TimeFunctions.lenientDateNormalize(c).isNotNull, 1)).as(s"__date_$name"),
        count(when(isTimeOnly(c), 1)).as(s"__time_$name"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.map { name =>
      val nonNull = row.getAs[Long](s"__nn_$name").toDouble
      def ratio(k: String) =
        if (nonNull == 0) 0.0 else row.getAs[Long](s"__${k}_$name") / nonNull
      // Check order mirrors the reference (csv_to_parquet.py:85-92): dates
      // are considered BEFORE numerics (with the time-only guard), so a
      // column parseable as both becomes an ISO date column.
      val decision =
        if (nonNull == 0) AsString
        else if (ratio("time") < 0.5 && ratio("date") >= DateThreshold) AsIsoDate
        else if (ratio("num") >= NumericThreshold) {
          if (row.getAs[Long](s"__int_$name") == row.getAs[Long](s"__num_$name")) AsLong
          else AsDouble
        } else AsString
      name -> decision
    }.toMap
  }

  /** Pass 2: projection applying the decisions. Unparseable values in a
    * typed column become null (the reference's pandas coercion semantics). */
  def applyDecisions(df: DataFrame, decisions: Map[String, Decision]): DataFrame = {
    val projected = df.columns.map { name =>
      val c = nn(colRef(name))
      decisions.getOrElse(name, AsString) match {
        case AsLong    => numericCandidate(c).cast("long").as(name)
        case AsDouble  => numericCandidate(c).as(name)
        case AsIsoDate => TimeFunctions.lenientDateNormalize(c).as(name)
        case AsString  => c.as(name)
      }
    }
    df.select(projected.toIndexedSeq: _*)
  }

  /** Full converter: profile + cast. `df` must be all-string (e.g. from
    * `spark.read.option("inferSchema", false).csv`). */
  def convert(df: DataFrame): DataFrame =
    applyDecisions(df, profile(df, df.columns.toIndexedSeq))
}
