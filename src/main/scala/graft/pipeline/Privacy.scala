package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy auditing for training-data pipelines: k-anonymity and
  * l-diversity over a table's quasi-identifier columns, plus the
  * suppression step that enforces them.
  *
  * A row is k-anonymous w.r.t. a quasi-identifier (QI) tuple when at
  * least k rows share its exact QI values; a QI group is l-diverse when
  * its rows carry at least l DISTINCT values of the sensitive attribute
  * (Sweeney 2002; Machanavajjhala et al. 2006 — both public literature).
  * Before a corpus with user-derived metadata ships to training, the
  * pipeline wants (a) the audit report — which QI groups are too small or
  * too uniform to release — and (b) the enforcement pass that suppresses
  * the offending rows.
  *
  * Scale shape: the report is ONE hash-aggregate on the QI keys
  * (`count` + `count(distinct sensitive)` — Spark plans the distinct as a
  * two-phase expand/aggregate with map-side partials, never a per-group
  * collect). Suppression re-joins the compliant group keys back with a
  * LEFT SEMI join; the group-key side is the aggregate output (bounded by
  * the number of distinct QI tuples, typically ≪ rows), so AQE broadcasts
  * it and the enforcement pass stays a single scan + broadcast semi-join
  * at any corpus size.
  *
  * Reference scope: the reference's surface has no privacy analog
  * (closest is its PII scan in the app layer); this module is part of the
  * LLM-pipeline extension set, same tier as [[TextAnalysis.piiReport]].
  */
object Privacy {

  /** Per-QI-group audit: group size `n`, distinct sensitive values
    * `n_sensitive`, and the two compliance flags. One aggregate pass. */
  def anonymityReport(df: DataFrame, quasi: Seq[String], sensitive: String,
                      k: Int, l: Int): DataFrame = {
    require(quasi.nonEmpty, "anonymityReport needs at least one quasi-identifier column")
    require(k >= 1 && l >= 1, s"k and l must be >= 1, got k=$k l=$l")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n"),
           countDistinct(col(sensitive)).as("n_sensitive"))
      .withColumn("k_anonymous", col("n") >= k)
      .withColumn("l_diverse", col("n_sensitive") >= l)
  }

  /** Enforcement: keep only rows whose QI group satisfies both bounds.
    * Aggregate the compliant group keys (bounded output), LEFT SEMI join
    * the corpus against them — broadcastable, one scan. */
  def suppress(df: DataFrame, quasi: Seq[String], sensitive: String,
               k: Int, l: Int): DataFrame = {
    val ok = anonymityReport(df, quasi, sensitive, k, l)
      .where(col("k_anonymous") && col("l_diverse"))
      .select(quasi.map(col): _*)
    df.join(ok, quasi, "left_semi")
  }
}
