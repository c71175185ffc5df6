package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy/governance audits for release gating: k-anonymity
  * (equivalence-class sizes over quasi-identifier columns),
  * l-diversity (distinct sensitive values per class), and the
  * generalization helpers (numeric bucketing, string prefixing) used
  * to walk a release up the anonymity ladder until it clears a
  * threshold.
  *
  * Scale shapes: every audit is ONE groupBy over the quasi-identifier
  * columns with map-side combine — the k-anonymity report adds a
  * second, class-keyed (much smaller) reduce on top. The per-class
  * frame is as skewed as the data's own quasi-identifier distribution
  * (inherent: that skew IS the quantity being measured); nothing is
  * collected to the driver. */
object Privacy {

  /** Bucket a numeric column to fixed-width ranges, keyed by the
    * bucket floor: floor(c / width) * width. The standard numeric
    * generalization step. */
  def generalizeNum(c: Column, width: Double): Column =
    floor(c / width) * width

  /** Truncate a string column to its first `n` characters — the
    * standard prefix generalization (zip/postcode-style). */
  def generalizePrefix(c: Column, n: Int): Column =
    substring(c, 1, n)

  /** Per-equivalence-class k-anonymity audit: the quasi-identifier
    * columns (expressions allowed via the expr map), class_size, and
    * `violates` = class_size < k. A released row in a violating class
    * is re-identifiable within fewer than k candidates. */
  def kAnonymity(df: DataFrame, quasi: Seq[(String, Column)],
                 k: Long): DataFrame = {
    val keys = quasi.map { case (n, c) => c.as(n) }
    df.groupBy(keys: _*)
      .agg(count(lit(1)).cast("long").as("class_size"))
      .withColumn("violates", col("class_size") < k)
  }

  /** One-row k-anonymity report: total rows, class count, the
    * achieved k (smallest class), rows in classes below the threshold
    * and their share. The release gate reads `risk_ratio`. */
  def kAnonymityReport(df: DataFrame, quasi: Seq[(String, Column)],
                       k: Long): DataFrame = {
    kAnonymity(df, quasi, k).agg(
      sum(col("class_size")).cast("long").as("n_rows"),
      count(lit(1)).cast("long").as("n_classes"),
      min(col("class_size")).cast("long").as("min_class_size"),
      sum(when(col("violates"), col("class_size")).otherwise(0L))
        .cast("long").as("n_rows_at_risk"),
      round(sum(when(col("violates"), col("class_size")).otherwise(0L))
              .cast("double") / sum(col("class_size")), 4)
        .as("risk_ratio"))
  }

  /** Per-class l-diversity audit: class_size, distinct sensitive
    * values in the class, `violates` = fewer than l distinct values —
    * a k-anonymous class whose sensitive attribute is constant still
    * leaks it. Exact distinct per class (the audit is a correctness
    * gate, not a telemetry estimate). */
  def lDiversity(df: DataFrame, quasi: Seq[(String, Column)],
                 sensitiveCol: String, l: Long): DataFrame = {
    val keys = quasi.map { case (n, c) => c.as(n) }
    df.groupBy(keys: _*)
      .agg(count(lit(1)).cast("long").as("class_size"),
           countDistinct(col(sensitiveCol)).cast("long")
             .as("n_sensitive"))
      .withColumn("violates", col("n_sensitive") < l)
  }

  /** Per-class t-closeness audit (nominal sensitive attribute, total
    * variation distance): how far each equivalence class's sensitive
    * distribution sits from the corpus-wide one — the leak l-diversity
    * misses (a class can hold l distinct values yet still be 90% one
    * disease). tv = 0.5 * sum_v |q_class(v) - p_global(v)|, computed
    * without materializing the class x value-domain cross product via
    * sum_v|q-p| = 1 + sum_{v present in class}(|q-p| - p).
    *
    * Shape: one (quasi, sensitive)-keyed count, one quasi-keyed
    * reduce, one broadcast-sized join against the global value
    * distribution (key space = sensitive domain, collected to the
    * driver like every other domain-sized frame — this also yields
    * the grand total, so no separate df.count() scan). NULL is a
    * first-class value on both sides: null-safe join keys keep
    * classes with NULL quasi values and rows with a NULL sensitive
    * value in both distributions, consistent with kAnonymity /
    * lDiversity's groupBy semantics. */
  def tCloseness(df: DataFrame, quasi: Seq[(String, Column)],
                 sensitiveCol: String, t: Double): DataFrame = {
    val spark = df.sparkSession
    val keys = quasi.map { case (n, c) => c.as(n) }
    val names = quasi.map(_._1)
    val cs = df.groupBy((keys :+ col(sensitiveCol).as("__v")): _*)
      .agg(count(lit(1)).cast("double").as("__ncv"))
    val glob = df.groupBy(col(sensitiveCol).as("__gv"))
      .agg(count(lit(1)).cast("double").as("__nv"))
    val globRows = glob.collect()
    val total = globRows.map(_.getDouble(1)).sum
    val globP = spark.createDataFrame(
        java.util.Arrays.asList(globRows: _*), glob.schema)
      .select(col("__gv"), (col("__nv") / lit(total)).as("__p"))
    val joined = cs.join(broadcast(globP), col("__v") <=> col("__gv"))
    val nc = cs.groupBy(names.map(col): _*)
      .agg(sum(col("__ncv")).as("__nc"))
      .select(names.map(n => col(n).as(s"__q_$n")) :+ col("__nc"): _*)
    val onQuasi = names.map(n => col(n) <=> col(s"__q_$n")).reduce(_ && _)
    joined.join(nc, onQuasi)
      .groupBy(names.map(col): _*)
      .agg(first(col("__nc")).cast("long").as("class_size"),
        (round(lit(0.5) * (lit(1.0) +
          sum(abs(col("__ncv") / col("__nc") - col("__p")) - col("__p"))), 6)
          + lit(0.0)).as("tv_distance"))
      .withColumn("violates", col("tv_distance") > t)
  }

  /** The anonymity ladder: k-anonymity reports at successive
    * generalization levels, one row per level (level index + the
    * report columns). `levels` maps a level name to its
    * quasi-identifier expressions; rows come back union-ed with a
    * `level` column so a single scan of the output shows where the
    * release first clears the threshold. */
  def anonymityLadder(df: DataFrame,
                      levels: Seq[(String, Seq[(String, Column)])],
                      k: Long): DataFrame = {
    levels.map { case (name, quasi) =>
      kAnonymityReport(df, quasi, k).withColumn("level", lit(name))
        .select(col("level"), col("n_rows"), col("n_classes"),
          col("min_class_size"), col("n_rows_at_risk"), col("risk_ratio"))
    }.reduce(_ unionByName _)
  }
}
