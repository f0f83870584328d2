package graft.store

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Local filesystem whose `rename` can be ARMED to fail — returning
  * false, exactly how Hadoop filesystems (and object-store connectors)
  * report rename failure — for renames whose (src, dst) match armed
  * substrings. Registered under the `faulty://` scheme by
  * [[SwapProtocolSpec]] to prove the store's commit protocols lose
  * nothing when a rename fails mid-commit. */
class FaultyFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "faulty"
  override def getUri: URI = URI.create("faulty:///")
  override def rename(src: Path, dst: Path): Boolean = {
    if (FaultyFileSystem.shouldFail(src.toString, dst.toString)) false
    else super.rename(src, dst)
  }
}

object FaultyFileSystem {
  /** (srcContains, dstContains): rename fails iff BOTH match. The
    * substrings must be chosen to hit only the commit rename under
    * test — Spark's own job-commit renames (task attempt → staging
    * output) run through this filesystem too. */
  @volatile var failWhen: Option[(String, String)] = None

  def shouldFail(src: String, dst: String): Boolean =
    failWhen.exists { case (s, d) => src.contains(s) && dst.contains(d) }

  def armed[A](srcContains: String, dstContains: String)(body: => A): A = {
    failWhen = Some((srcContains, dstContains))
    try body finally failWhen = None
  }
}
