package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** The typed mapPartitions decode path (the part of the multimodal pipeline
  * no SQL oracle can see): batch shape, determinism, and metadata agreement
  * with the SQL-visible features of q48.
  */
class MultimodalSpec extends SparkSpec {

  test("decode stub is deterministic and schema-stable across runs") {
    import spark.implicits._
    val assets = Multimodal.assets(Tables.documents(spark, sf))
      .select(col("asset_id"), col("bytes"), col("meta.mime").as("mime"))
      .as[Multimodal.Asset]
    val a = Multimodal.decodeFeatures(assets).orderBy("asset_id").collect()
    val b = Multimodal.decodeFeatures(assets).orderBy("asset_id").collect()
    assert(a.length === 500)
    assert(a.toSeq === b.toSeq)
    assert(a.forall(f => f.width >= 1 && f.width <= 640))
    assert(a.forall(f => f.height >= 1 && f.height <= 480))
  }

  test("decoded n_bytes equals the SQL-visible byte length (ASCII corpus)") {
    import spark.implicits._
    val assets = Multimodal.assets(Tables.documents(spark, sf))
      .select(col("asset_id"), col("bytes"), col("meta.mime").as("mime"))
      .as[Multimodal.Asset]
    val decoded = Multimodal.decodeFeatures(assets)
      .select(col("asset_id"), col("n_bytes"))
    val sql = Multimodal.assets(Tables.documents(spark, sf))
      .select(col("asset_id"), length(col("bytes")).as("n_bytes"))
    assert(decoded.except(sql).count() === 0)
    assert(sql.except(decoded).count() === 0)
  }

  test("frameDigests: frame geometry and digests match an in-memory replay") {
    import spark.implicits._
    val payloads = Seq(
      1L -> "a" * 64,        // exact multiple: exactly 1 frame, no empty tail
      2L -> "a" * 65,        // one byte over: 2 frames, 1-byte tail
      3L -> ("a" * 64 + "b"), // frame 0 is "a"*64 again → 3 identical frame-0s
      4L -> "",              // empty payload: ZERO frames, never a pair
      5L -> "short")
    val assets = payloads
      .map { case (id, t) => (id, t.getBytes("UTF-8"), "text/plain") }
      .toDF("asset_id", "bytes", "mime").as[Multimodal.Asset]
    val got = Multimodal.frameDigests(assets).collect()
      .map(f => (f.asset_id, f.frame_idx) -> f.frame_md5).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def ref(b: Array[Byte]): String = {
      md.reset(); md.update(b); md.digest().map("%02x".format(_)).mkString
    }
    val want = payloads.flatMap { case (id, t) =>
      t.getBytes("UTF-8").grouped(64).zipWithIndex.map { case (sl, i) =>
        (id, i) -> ref(sl)
      }
    }.toMap
    assert(got === want)
    assert(!got.keySet.exists(_._1 == 4L), "empty payload must emit no frames")
    // the three identical 64-byte frames collapse to one fingerprint
    assert(Set(got((1L, 0)), got((2L, 0)), got((3L, 0))).size === 1)
  }

  test("approx_count_distinct stays within 10% of exact (q43 contract)") {
    val rows = graft.queries.Gaps.q43ApproxDistinct.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"status ${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
