package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (AS OF) join: for every left row, the single most
  * recent right row with `right.ts <= left.ts` on the same key — the
  * time-series join Spark lacks as a native operator (SURVEY §2.5 has
  * no as-of in the reference either; added as a first-class
  * training-pipeline operator).
  *
  * Implementation is the UNION + windowed last_value technique, not a
  * range join: tag both inputs, union them, and carry the latest right
  * payload forward with `last(ignoreNulls) over (partition by key
  * order by ts, side)`. ONE shuffle on (key), no theta-join blow-up,
  * no per-row probe — at 100 TB this is the difference between a
  * sort-within-partition and an O(|L|·|R|-per-key) inequality join.
  * Right rows sort before left rows at equal ts, so `ts-equal` right
  * rows are visible to left rows at the same instant (>= semantics,
  * matching DuckDB/pandas ASOF).
  *
  * All payload columns travel in ONE struct, so the window's
  * `last(ignoreNulls)` skips only missing ROWS (left-side rows in the
  * union), never individual NULL payload VALUES: a right row whose
  * payload is legitimately NULL is matched as NULL, and a multi-column
  * payload always comes from a single right row — never a mix.
  *
  * Left rows with no preceding right row keep NULL payloads (LEFT ASOF
  * semantics).
  *
  * NULL event times: a right row with NULL ts has no position in time
  * and is DROPPED in both implementations (without the explicit
  * filter, the window form's nulls-first sort would treat it as
  * "before everything" while the broadcast form's comparison would
  * drop it — a silent divergence); a left row with NULL ts matches
  * nothing and keeps NULL payloads.
  */
object AsOfJoin {

  /** @param left       probe side (each row is preserved exactly once)
    * @param right      reference side; (key, ts) SHOULD be unique —
    *                   ties are broken by the last row in (ts) order
    * @param keyCols    equi-key columns present in both inputs
    * @param tsCol      event-time column name present in both inputs
    * @param payloadCols right columns to carry onto left rows */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payloadCols.contains),
      s"payload columns ${payloadCols.filter(leftCols.contains)} collide with left side")

    val payloadType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c)))
    val lPadded = left.withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(payloadType))
    val r = right.filter(col(tsCol).isNotNull)
      .select(
        (keyCols :+ tsCol).map(col) :+
          struct(payloadCols.map(col): _*).as("__payload"): _*)
      .withColumn("__side", lit(0))
    val rPadded = leftCols.filterNot((keyCols :+ tsCol).contains)
      .foldLeft(r)((d, c) =>
        d.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val cols = leftCols ++ Seq("__payload", "__side")
    val u = lPadded.select(cols.map(col): _*)
      .unionByName(rPadded.select(cols.map(col): _*))

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__payload", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col("__payload").getField(c).as(c)): _*)
  }

  /** As-of join for a DIM-SIZED right side: the right table collapses
    * to one broadcast row per key holding its ts-sorted timeline, and
    * every left row probes that array in place — the left (fact) side
    * is never shuffled, re-sorted, or fanned out. Same semantics as
    * [[asof]] (>= match, LEFT, whole-row payload).
    *
    * Use when |right| fits a broadcast (slowly-changing dimensions,
    * price books, config history): at 100 TB of facts this replaces
    * [[asof]]'s full shuffle-and-sort of the union with a map-side
    * BroadcastHashJoin plus an O(timeline) in-row scan. NOT for a
    * right side proportional to the fact stream — timelines then
    * outgrow both the broadcast and the per-row scan.
    */
  def asofBroadcast(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                    tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payloadCols.contains),
      s"payload columns ${payloadCols.filter(leftCols.contains)} collide with left side")

    // struct sorts by field order, so ts first ⇒ sort_array = timeline
    val timelines = right.filter(col(tsCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(struct(
        (col(tsCol).as("__ts") +: payloadCols.map(col)): _*))).as("__tl"))
      .select(keyCols.map(k => col(k).as(s"__rk_$k")) :+ col("__tl"): _*)
    // null-safe key equality (<=>): [[asof]]'s window groups NULL keys
    // together, so the broadcast form must match them too — a plain
    // equi-join would silently drop every NULL-keyed left row's match
    val joinCond = keyCols.map(k => col(k) <=> col(s"__rk_$k")).reduce(_ && _)
    val probed = left.join(broadcast(timelines), joinCond, "left")
      // last timeline entry at or before the probe ts; empty ⇒ NULL row
      // (try_: ANSI element_at throws on an empty array)
      .withColumn("__hit",
        try_element_at(filter(col("__tl"), e => e.getField("__ts") <= col(tsCol)), lit(-1)))
    probed.select(leftCols.map(col) ++
      payloadCols.map(c => col("__hit").getField(c).as(c)): _*)
  }
}
