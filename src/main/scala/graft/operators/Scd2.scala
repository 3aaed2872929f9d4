package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD2 (slowly-changing-dimension, type 2) merge: apply an update batch to
  * a historized dimension, closing changed rows and appending new versions —
  * the standard warehouse mechanism for "what did this customer look like
  * when the order shipped".
  *
  * Dimension contract: `key, attrs..., valid_from, valid_to, is_current`
  * with exactly one `is_current` row per key (`valid_to` null on it).
  *
  * Plan shape: everything joins on the business key, so the whole merge is
  * ONE co-partitioned shuffle (history rows pass through untouched with no
  * join at all); at 100 TB the cost is the changed-key join, not dimension
  * size. Attribute comparison is null-safe (`<=>`). The merge is
  * deterministic and idempotent for a given (dim, updates, batchId) — an
  * update identical to the current attributes is a no-op, so replaying a
  * batch does not create empty versions.
  */
object Scd2 {

  def merge(dim: DataFrame, updates: DataFrame, key: String, attrs: Seq[String],
      batchId: Long): DataFrame = {
    val history = dim.filter(!col("is_current"))
    // explicit presence markers, NOT attr null-ness: an update may
    // legitimately set an attribute to NULL, and a current row's attrs may
    // be NULL — null-safe comparison plus markers keep both cases correct
    val current = dim.filter(col("is_current")).withColumn("_cur", lit(1))
    val u = attrs.foldLeft(updates.select((key +: attrs).map(col): _*)) {
      (acc, a) => acc.withColumnRenamed(a, s"_u_$a")
    }.withColumn("_upd", lit(1))
    val changed = attrs.map(a => !(col(a) <=> col(s"_u_$a"))).reduce(_ || _)
    // current rows: closed if a differing update arrived, else untouched
    val closedOrKept = current.join(u, Seq(key), "left")
      .select(
        (Seq(col(key)) ++
          attrs.map(col) :+
          col("valid_from") :+
          when(col("_upd").isNotNull && changed, lit(batchId))
            .otherwise(col("valid_to")).as("valid_to") :+
          (col("_upd").isNull || !changed).as("is_current")): _*)
    // new versions: an update whose key is absent from current, or differs
    val newVersions = u.join(current, Seq(key), "left")
      .filter(col("_cur").isNull || changed)
      .select(
        (Seq(col(key)) ++
          attrs.map(a => col(s"_u_$a").as(a)) :+
          lit(batchId).as("valid_from") :+
          lit(null).cast("long").as("valid_to") :+
          lit(true).as("is_current")): _*)
    history.unionByName(closedOrKept).unionByName(newVersions)
  }
}
