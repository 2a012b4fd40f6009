package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-heap top-k AGGREGATE: keeps the k best (score, id) pairs per
  * group with map-side partial aggregation.
  *
  * Why not `row_number().over(Window.partitionBy(q))`: the window form
  * shuffles and sorts EVERY scored row (O(n·m) rows for a knn join)
  * before discarding all but k per group. The aggregate form reduces to
  * ≤ k rows per group per partition at the map side, so the shuffle
  * carries partitions × groups × k rows — at 100 TB the difference
  * between a terabyte-scale sort and a few megabytes.
  *
  * Ordering: score desc, id asc (deterministic ties). Buffer is a plain
  * array kept sorted (k is small — binary-insert beats a heap's object
  * churn for k ≤ ~100).
  */
object TopKAgg {

  type Pair = (Double, Long)

  private class TopK(k: Int)
      extends Aggregator[Pair, Array[Pair], Seq[Pair]] {

    override def zero: Array[Pair] = Array.empty

    private def better(a: Pair, b: Pair): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    override def reduce(buf: Array[Pair], in: Pair): Array[Pair] = {
      // NaN skipped like NULL (mirrors TopKPairs.update): better() is
      // false both ways for NaN, so one admitted NaN in the last slot
      // would block every later genuine score
      if (in._1.isNaN) return buf
      if (buf.length < k) {
        insert(buf, in)
      } else if (better(in, buf(buf.length - 1))) {
        insert(buf.dropRight(1), in)
      } else buf
    }

    private def insert(buf: Array[Pair], in: Pair): Array[Pair] = {
      // binary search for the insertion point in the desc-sorted buffer
      var lo = 0; var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (better(buf(mid), in)) lo = mid + 1 else hi = mid
      }
      val out = new Array[Pair](buf.length + 1)
      System.arraycopy(buf, 0, out, 0, lo)
      out(lo) = in
      System.arraycopy(buf, lo, out, lo + 1, buf.length - lo)
      out
    }

    override def merge(a: Array[Pair], b: Array[Pair]): Array[Pair] = {
      var acc = a
      var i = 0
      while (i < b.length) { acc = reduce(acc, b(i)); i += 1 }
      acc
    }

    override def finish(buf: Array[Pair]): Seq[Pair] = buf.toSeq

    override def bufferEncoder: Encoder[Array[Pair]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Pair]]()
    override def outputEncoder: Encoder[Seq[Pair]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Pair]]()
  }

  /** Column form: `topK(k)(score, id)` → array<struct<_1,_2>> of the k
    * best, score-desc/id-asc. */
  def topK(k: Int)(score: Column, id: Column): Column = {
    // fail fast at call time: k = 0 would read buf(-1) inside an
    // executor with an opaque mid-stage stack trace
    require(k > 0, s"topK needs k > 0, got $k")
    udaf(new TopK(k), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      .apply(score, id)
  }
}
