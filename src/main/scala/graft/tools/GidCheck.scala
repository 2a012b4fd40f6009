package graft.tools

import org.apache.spark.sql.functions._
import graft.multimodal.{MediaIndex, Multimodal, PerceptualHash}

/** Fixture-verification tool for the q212 render-gid constants: the
  * letterbox render family's gradient dual-hashes are LOW-ENTROPY
  * (block-mean patterns of linear gradients approximate half-planes),
  * so distinct render parameters do NOT imply distinct perceptual
  * hashes — measured here: 29 exact (ahash, dhash) collisions among
  * gids 0–199. Any oracle that decides media dup-ness by
  * render-parameter equality must therefore either byte-pin the
  * judge (imageMaxDist = 0) AND draw its "fresh" gids from a
  * verified collision-free set — which this main computes (the
  * q212 `FreshGids` constant: first 48 gids ≥ 30 whose dual-hash
  * key collides with no history gid 0–29 and no earlier pick) — or
  * replay the hash math in SQL outright (the q203 road). Run:
  * `sbt "runMain graft.tools.GidCheck"`. */
object GidCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("local[8]", 8, "gidcheck")
    import spark.implicits._
    val gids = spark.range(0, 400).select(col("id").as("g"))
    def lb(g: org.apache.spark.sql.Column) =
      PerceptualHash.renderLetterboxImage16(g * 7, pmod(g, lit(5)) + 1,
        pmod(g, lit(11)) + 1, pmod(g, lit(3)), lit(0L), lit("png"))
    val idx = MediaIndex.mediaHashIndex(
      gids.select(col("g").as("media_id"), lit("image").as("kind"),
        lb(col("g")).as("payload")).as[Multimodal.Media]
        .localCheckpoint(true)).localCheckpoint(true)
    val rows = idx.select(col("media_id"), col("ahash"), col("dhash"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val dupPairs = for {
      a <- rows; b <- rows
      if a._1 < b._1 && (a._2, a._3) == (b._2, b._3)
    } yield (a._1, b._1)
    println(s"GIDCHECK exact dual-hash collisions (gid < 200): " +
      dupPairs.count(p => p._2 < 200))
    val histKeys = rows.filter(_._1 < 30).map(r => (r._2, r._3)).toSet
    val picked = scala.collection.mutable.ArrayBuffer.empty[Long]
    val used = scala.collection.mutable.Set.empty[(Long, Long)]
    for (r <- rows if r._1 >= 30 && picked.size < 48) {
      val k = (r._2, r._3)
      if (!histKeys.contains(k) && !used.contains(k)) {
        picked += r._1; used += k
      }
    }
    println("GIDCHECK picked " + picked.size + ": " + picked.mkString(","))
    spark.stop()
  }
}
