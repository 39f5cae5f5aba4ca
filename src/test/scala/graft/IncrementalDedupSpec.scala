package graft

import java.nio.file.Files

import graft.queries.Dedup
import org.apache.spark.sql.functions._

/** The ingest-time LSH contract: deduplicating a new batch against a
  * PERSISTED signature index must find exactly the pairs a full recompute
  * over the grown corpus would — no more (no phantom candidates from stale
  * state), no fewer (no near-dup slips past because its partner's
  * signatures were only on disk).
  */
class IncrementalDedupSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("incremental batch dedup equals the full recompute, disjointly") {
    val corpus = Tables.documentsWide(spark, sf)
      .select(col("doc_id"), col("text"))
    val old = corpus.filter(col("doc_id") % 3 =!= 0)
    val fresh = corpus.filter(col("doc_id") % 3 === 0)

    // the index is persisted and re-read: what survives between ingest runs
    // is parquet bytes, not a cached plan
    val dir = Files.createTempDirectory("lsh-index").toString
    Dedup.minhashIndex(old).write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)

    val full = pairs(Dedup.nearDups(corpus))
    val oldOnly = pairs(Dedup.nearDups(old))
    val inc = pairs(Dedup.incrementalNearDups(fresh, stored, corpus))

    assert(full.nonEmpty, "fixture must produce near-dup pairs")
    assert(inc.nonEmpty, "the new batch must contribute pairs")
    // every incremental pair touches the new batch; old-old pairs never
    // reappear (they were found when THEIR batch arrived)
    assert(inc.forall { case (a, b) => a % 3 == 0 || b % 3 == 0 })
    assert((oldOnly & inc) === Set.empty)
    assert((oldOnly | inc) === full,
      s"missing=${full -- oldOnly -- inc} phantom=${(oldOnly | inc) -- full}")
  }

  test("q32 still matches its pre-refactor output shape on the fixture") {
    // the factored stages (shingleRows/minhashBands/verifyJaccard) must
    // reproduce the registered query bit for bit — jaccard included
    val viaQ = SparkEntry.queries("q32_minhash_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaHelper = Dedup.nearDups(
      Tables.documentsWide(spark, sf).select(col("doc_id"), col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaQ === viaHelper)
  }

  test("a 3-batch streaming drain equals the one-shot corpus recompute") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val corpus = Tables.documentsWide(spark, sf)
      .select(col("doc_id"), col("text"))
    val rows = corpus.collect().map(r => (r.getLong(0), r.getString(1)))
    val batches = rows.groupBy(_._1 % 3).toSeq.sortBy(_._1).map(_._2.toSeq)

    val root = Files.createTempDirectory("ingest-dedup").toString
    val in = MemoryStream[(Long, String)]
    val q = Dedup.streamIngestDedup(
      in.toDF().toDF("doc_id", "text"), s"$root/state", s"$root/pairs")
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val streamed = pairs(spark.read.parquet(s"$root/pairs/batch_*"))
    val full = pairs(Dedup.nearDups(corpus))
    assert(full.nonEmpty && streamed.nonEmpty)
    assert(streamed === full,
      s"missing=${full -- streamed} phantom=${streamed -- full}")
  }

  test("replaying a micro-batch leaves its pairs output unchanged") {
    // the at-least-once contract: foreachBatch may re-run a batch id whose
    // state writes already landed. The replay must not see its own first
    // attempt's docs as corpus (that would double rows on the verify side
    // and inflate jaccard into phantom pairs) — ingestBatch excludes
    // batch_<id> from the state listing, so the re-run is byte-identical.
    val corpus = Tables.documentsWide(spark, sf)
      .select(col("doc_id"), col("text"))
    val b0 = corpus.filter(col("doc_id") % 3 =!= 0)
    val b1 = corpus.filter(col("doc_id") % 3 === 0)
    val root = Files.createTempDirectory("ingest-replay").toString

    Dedup.ingestBatch(b0, 0L, s"$root/state", s"$root/pairs")
    Dedup.ingestBatch(b1, 1L, s"$root/state", s"$root/pairs")
    val first = spark.read.parquet(s"$root/pairs/batch_1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // crash-after-state-write, then redelivery of the same batch id
    Dedup.ingestBatch(b1, 1L, s"$root/state", s"$root/pairs")
    val replayed = spark.read.parquet(s"$root/pairs/batch_1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(first.nonEmpty, "fixture must produce pairs in batch 1")
    assert(replayed === first,
      s"phantom=${replayed -- first} lost=${first -- replayed}")
    // and the drained result still equals the one-shot recompute
    val streamed = pairs(spark.read.parquet(s"$root/pairs/batch_*"))
    assert(streamed === pairs(Dedup.nearDups(corpus)))
  }

  test("incremental verify re-shingles only candidate-touched documents") {
    val corpus = Tables.documentsWide(spark, sf)
      .select(col("doc_id"), col("text"))
    val old = corpus.filter(col("doc_id") % 3 =!= 0)
    val fresh = corpus.filter(col("doc_id") % 3 === 0)
    val stored = Dedup.minhashIndex(old)
    val plan = Dedup.incrementalNearDups(fresh, stored, corpus)
      .queryExecution.executedPlan.toString
    // the corpus reaches the verify join through a semi join on the
    // candidate closure — not as a bare full-corpus shingle explode
    assert(plan.contains("LeftSemi"),
      s"verify side lost its candidate-closure prune:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }
}
