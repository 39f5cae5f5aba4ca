package graft

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

import java.net.URI
import java.util.concurrent.atomic.AtomicInteger

/** A `file`-backed Hadoop FileSystem registered under the `s3like://`
  * scheme that emulates the two S3 behaviors `FlakyRenameFileSystem`'s
  * boolean-rename double does not — the remaining offline-feasible slice
  * of S6's object-store semantics:
  *
  *  1. EVENTUALLY-CONSISTENT LISTING (`delayedListings`): the next N
  *     `listStatus` calls on an export STAGING directory omit the
  *     highest-numbered `__bucket=` child, exactly the "recently written
  *     object not yet in LIST results" anomaly. Hiding the TAIL bucket is
  *     the adversarial choice: a contiguity-only check would still pass
  *     and silently export one file short — which is why the rename pass
  *     checks the listed set against the DATA-derived expected count.
  *  2. NON-ATOMIC DIRECTORY RENAME (`nonAtomicDirRenames`): the next N
  *     directory renames under a Spark committer `_temporary` tree move
  *     only half their children and then report failure — the
  *     copy-then-die state a real object store's per-object "rename"
  *     leaves behind. The partial residue stays confined to the
  *     committer's temporary tree; the export must abort with no final
  *     artifact.
  *
  * Both knobs are one-shot counters so a test injects exactly the
  * failures it asserts; everything else passes through to the local FS.
  */
class S3LikeFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("s3like:///")

  override def listStatus(p: Path): Array[FileStatus] = {
    // 3. LOST-UPDATE LISTING (`hiddenNames`): every listing omits children
    //    with these names — the "another writer's freshly-committed run is
    //    not yet in LIST results" anomaly a racing compact reads through.
    //    Name-keyed (not counter-keyed) so a multi-listing operation like
    //    compact sees one CONSISTENTLY stale view; the hidden run's files
    //    still exist and open fine (S3 read-after-write is consistent,
    //    LIST is what lags).
    val hiddenNow = S3LikeFileSystem.hiddenNames.get()
    val full0 = super.listStatus(p)
    val full =
      if (hiddenNow.isEmpty) full0
      else full0.filterNot(s => hiddenNow.contains(s.getPath.getName))
    val buckets = full.filter(_.getPath.getName.startsWith("__bucket="))
    if (p.getName.startsWith(".staging_") && buckets.nonEmpty &&
        S3LikeFileSystem.delayedListings.getAndUpdate(n => math.max(0, n - 1)) > 0) {
      val byNo = buckets.sortBy(_.getPath.getName.stripPrefix("__bucket=").toLong)
      // hide the tail bucket (the contiguity-evading case) or a middle one
      val hidden =
        if (S3LikeFileSystem.hideMiddle.get() && byNo.length > 2) byNo(byNo.length / 2)
        else byNo.last
      full.filterNot(_ eq hidden)
    } else full
  }

  override def rename(src: Path, dst: Path): Boolean = {
    val committerDir = src.toString.contains("_temporary") &&
      getFileStatus(src).isDirectory
    if (committerDir &&
        S3LikeFileSystem.nonAtomicDirRenames.getAndUpdate(n => math.max(0, n - 1)) > 0) {
      val kids = super.listStatus(src).sortBy(_.getPath.getName)
      super.mkdirs(dst)
      kids.take(kids.length / 2)
        .foreach(k => super.rename(k.getPath, new Path(dst, k.getPath.getName)))
      false
    } else super.rename(src, dst)
  }
}

object S3LikeFileSystem {
  val delayedListings = new AtomicInteger(0)
  val nonAtomicDirRenames = new AtomicInteger(0)
  val hideMiddle = new java.util.concurrent.atomic.AtomicBoolean(false)
  val hiddenNames =
    new java.util.concurrent.atomic.AtomicReference[Set[String]](Set.empty)
}
