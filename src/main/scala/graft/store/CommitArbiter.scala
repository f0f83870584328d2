package graft.store

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import scala.util.control.NonFatal

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** A FileSystem (or connector shim) exposing a TRUE conditional-write
  * primitive: publish a complete object at `path` iff nothing is there,
  * with storage-arbitrated exactly-one-winner semantics. This is what
  * S3 `If-None-Match: *`, a GCS `ifGenerationMatch=0` precondition, or
  * an ABFS etag precondition provide natively. A deployment whose
  * connector exposes conditional writes through a different API wraps
  * it in this trait (a thin FileSystem subclass is enough) and selects
  * the `conditional` arbiter — the store then routes BOTH of its
  * check-then-act commit points (the write-lock create and the manifest
  * version flip) through the primitive. */
trait AtomicCommit {
  def putIfAbsent(path: Path, body: Array[Byte]): Boolean
}

/** The ONE storage primitive the multi-writer contract rests on:
  * publish a COMPLETE small object at a fixed path with
  * exactly-one-winner semantics. Two commit points use it —
  * [[WriteLock]]'s create-if-absent and [[Manifest.commit]]'s
  * `v<N>.json` flip. Everything above them (optimistic windows, staging
  * protocols, stale-lock takeover) is correct GIVEN this primitive; on
  * storage where the chosen arbiter cannot provide it, the whole
  * multi-writer story degrades to advisory.
  *
  * Selected per session via `spark.graft.commit.arbiter`:
  *  - `atomic` (default): the filesystem's own atomic primitives —
  *    kernel-arbitrated hardlink publish on `file`, namenode-arbitrated
  *    no-overwrite rename on HDFS-like stores. ADVISORY on object
  *    stores (their create/rename are check-then-act) — acquiring
  *    warns loudly once per scheme.
  *  - `conditional`: a conditional-write (If-None-Match) publish of the
  *    final object, for object stores whose connector either implements
  *    [[AtomicCommit]] or honors `create(path, overwrite = false)` as a
  *    genuine conditional PUT at close (S3A on Hadoop >= 3.4.2 with
  *    conditional creates enabled). Refuses filesystems with
  *    progressive-visibility writes (file/hdfs), where `atomic` is both
  *    correct and cheaper.
  *  - a fully-qualified class name: a custom [[CommitArbiter]] with a
  *    zero-arg constructor, for deployments arbitrating through an
  *    external coordinator (e.g. a DynamoDB/ZooKeeper CAS).
  */
trait CommitArbiter {
  def name: String

  /** Publish `body` at `path` iff nothing is there. True = we won;
    * false = another writer's object is there (ours was not written).
    * Losers never disturb the winner's object, and a reader never
    * observes a partial object at `path`. */
  def putIfAbsent(fs: FileSystem, path: Path, body: Array[Byte]): Boolean

  /** Whether the one-winner guarantee actually holds on `fs` — drives
    * [[WriteLock]]'s once-per-scheme advisory warning. */
  def atomicOn(fs: FileSystem): Boolean
}

object CommitArbiter {
  val Conf = "spark.graft.commit.arbiter"

  /** Explicit operator attestation that the object-store connector
    * honors `create(path, overwrite = false)` as a TRUE conditional PUT
    * (If-None-Match at close) even though it does not advertise the
    * capability — the escape hatch for connectors that implement the
    * semantics but predate the capability key. Without this, the
    * `conditional` arbiter refuses a connector that neither implements
    * [[AtomicCommit]] nor reports
    * [[ConditionalCreateArbiter.CapabilityKey]]: silently degrading to
    * check-then-act while claiming a hard guarantee is the one failure
    * mode an arbiter must never have. */
  val TrustedConf = "spark.graft.commit.conditional.trusted"

  /** Schemes whose Hadoop connectors implement create-if-absent and
    * rename as check-then-act rather than an atomic primitive. */
  val NonAtomicSchemes: Set[String] =
    Set("s3a", "s3", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs", "oss",
      "cos")

  private val atomic = new FsAtomicArbiter
  private val conditional = new ConditionalCreateArbiter(trusted = false)
  private val conditionalTrusted = new ConditionalCreateArbiter(trusted = true)
  private val custom = new ConcurrentHashMap[String, CommitArbiter]()

  def resolve(spark: SparkSession): CommitArbiter =
    spark.conf.get(Conf, "atomic") match {
      case "atomic" => atomic
      case "conditional" =>
        if (spark.conf.get(TrustedConf, "false").trim.equalsIgnoreCase("true"))
          conditionalTrusted
        else conditional
      case fqcn =>
        custom.computeIfAbsent(fqcn, c =>
          try Class.forName(c).getDeclaredConstructor().newInstance()
            .asInstanceOf[CommitArbiter]
          catch {
            case NonFatal(e) => throw new StoreException(
              s"$Conf '$c' is not 'atomic', 'conditional', or a " +
              s"loadable CommitArbiter class: $e")
          })
    }

  private[store] def schemeOf(fs: FileSystem): String =
    Option(fs.getUri.getScheme).getOrElse("file").toLowerCase
}

/** Default arbiter: the filesystem's own atomic primitives.
  *
  * `file`: body is written to a `.tmp-*` sibling, then HARDLINKED to
  * the final name — `Files.createLink` is O_EXCL-like at the kernel
  * (exactly one winner, `FileAlreadyExistsException` for the rest) and
  * the content is complete before the name exists (no torn reads).
  * Plain `rename` would NOT do: POSIX rename silently replaces an
  * existing target, so two racers that both passed an exists-check
  * would swallow one commit — the lost-manifest shape this arbiter
  * exists to prevent, even on a shared NFS mount.
  *
  * Other schemes: body to a `.tmp-*` sibling via the FileSystem, then
  * `rename(tmp, final)` — atomic-with-no-overwrite at the HDFS
  * namenode (rename onto an existing target returns false = we lost).
  * Object-store connectors implement BOTH create-if-absent and rename
  * as check-then-act, so there this arbiter is advisory
  * ([[atomicOn]] false → [[WriteLock]] warns once per scheme); pick
  * `conditional` there instead.
  *
  * Crash debris is a `.tmp-*` file next to the target; vacuum reaps
  * those in the table root and `_manifests` past the age bound. */
final class FsAtomicArbiter extends CommitArbiter {
  override def name: String = "atomic"

  override def atomicOn(fs: FileSystem): Boolean =
    !CommitArbiter.NonAtomicSchemes.contains(CommitArbiter.schemeOf(fs))

  override def putIfAbsent(fs: FileSystem, path: Path,
                           body: Array[Byte]): Boolean =
    if (CommitArbiter.schemeOf(fs) == "file") linkPublish(path, body)
    else renamePublish(fs, path, body)

  private def linkPublish(path: Path, body: Array[Byte]): Boolean = {
    val target = new java.io.File(path.toUri.getPath)
    Option(target.getParentFile).foreach(_.mkdirs())
    val tmp = new java.io.File(target.getParentFile,
      s".tmp-${UUID.randomUUID()}")
    try {
      val out = new java.io.FileOutputStream(tmp)
      try out.write(body) finally out.close()
      try {
        java.nio.file.Files.createLink(target.toPath, tmp.toPath)
        // raw write bypasses Hadoop's checksum layer; a stale `.crc`
        // from an fs.create-written ancestor would fail fs.open reads
        new java.io.File(target.getParentFile, s".${target.getName}.crc")
          .delete()
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } finally { tmp.delete(); () }
  }

  private def renamePublish(fs: FileSystem, path: Path,
                            body: Array[Byte]): Boolean = {
    val tmp = new Path(path.getParent, s".tmp-${UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try {
      try out.write(body) finally out.close()
    } catch {
      case e: Throwable =>
        try fs.delete(tmp, false) catch { case _: Exception => () }
        throw e
    }
    if (fs.rename(tmp, path)) true
    else {
      try fs.delete(tmp, false) catch { case _: Exception => () }
      if (fs.exists(path)) false // rename refused: the target exists — we lost
      else throw new java.io.IOException(
        s"rename $tmp -> $path failed with no existing target (filesystem " +
        "error, not commit contention)")
    }
  }
}

/** Conditional-write arbiter for object stores: publishes the FINAL
  * object directly — object-store PUTs are all-or-nothing (a reader
  * never sees a partial object), and a conditional PUT (S3
  * `If-None-Match: *`, GCS generation 0, ABFS etag) makes it
  * exactly-one-winner. Two paths:
  *
  *  - the FileSystem implements [[AtomicCommit]] → delegate (the seam
  *    for connector shims and for the injected racy-filesystem spec
  *    that PROVES one-winner under non-atomic create/rename);
  *  - otherwise `create(path, overwrite = false)` + write + close,
  *    treating `FileAlreadyExistsException` from EITHER create or
  *    close as losing — on S3A (Hadoop >= 3.4.2, conditional creates
  *    enabled) the PUT happens at close with If-None-Match, so that is
  *    exactly the conditional-write contract.
  *
  * Filesystems with progressive-visibility writes (file, hdfs, viewfs)
  * are refused: a half-written `v<N>.json` would be READABLE there
  * mid-create, and the `atomic` arbiter is both correct and cheaper on
  * them. Only an explicit FileAlreadyExists maps to "lost" — any other
  * IO failure rethrows loudly rather than guessing (misreading a
  * network error as contention could double-apply a mutation on
  * retry).
  *
  * The raw-create path is GUARDED: before trusting
  * `create(overwrite = false)` as a conditional PUT, the connector must
  * either advertise [[ConditionalCreateArbiter.CapabilityKey]] through
  * `hasPathCapability` (S3A does from the Hadoop release that added
  * conditional writes) or the operator must attest it via
  * `spark.graft.commit.conditional.trusted=true`. A connector that does
  * neither — an older Hadoop, conditional creates disabled — implements
  * the no-overwrite flag as exists-check + unconditional PUT: the
  * arbiter would silently be advisory while `atomicOn` reports a hard
  * guarantee, which is exactly the lie this guard refuses to tell.
  * [[atomicOn]] mirrors the same three-way test, so on an unverifiable
  * connector the caller gets a loud refusal from `putIfAbsent` and the
  * write lock's advisory warning from `atomicOn`, never silence. */
final class ConditionalCreateArbiter(trusted: Boolean) extends CommitArbiter {
  import ConditionalCreateArbiter.CapabilityKey

  override def name: String = "conditional"

  override def atomicOn(fs: FileSystem): Boolean = fs match {
    case _: AtomicCommit => true
    case _ => trusted || advertisesConditionalCreate(fs, new Path("/"))
  }

  /** `hasPathCapability` probe, never trusted to not throw (connector
    * shims may reject unknown keys loudly): any failure reads as "not
    * advertised". */
  private def advertisesConditionalCreate(fs: FileSystem, p: Path): Boolean =
    try fs.hasPathCapability(p, CapabilityKey)
    catch { case NonFatal(_) => false }

  override def putIfAbsent(fs: FileSystem, path: Path,
                           body: Array[Byte]): Boolean = fs match {
    case ac: AtomicCommit => ac.putIfAbsent(path, body)
    case _ =>
      val scheme = CommitArbiter.schemeOf(fs)
      if (!CommitArbiter.NonAtomicSchemes.contains(scheme))
        throw new StoreException(
          s"${CommitArbiter.Conf}=conditional on scheme '$scheme': this " +
          "arbiter needs whole-object-at-close visibility (object stores) " +
          "or an AtomicCommit filesystem; use 'atomic' on " +
          "local/HDFS-like storage, where it is both correct and cheaper")
      if (!trusted && !advertisesConditionalCreate(fs, path))
        throw new StoreException(
          s"${CommitArbiter.Conf}=conditional on scheme '$scheme': the " +
          s"connector does not advertise '$CapabilityKey' (conditional " +
          "create), so create(overwrite=false) may be exists-check + " +
          "unconditional PUT — a commit through it would be ADVISORY " +
          "while claiming exactly-one-winner. Upgrade the connector to " +
          "one with conditional-write support, wrap it in an " +
          "AtomicCommit shim, or attest the semantics explicitly with " +
          s"${CommitArbiter.TrustedConf}=true")
      var out: org.apache.hadoop.fs.FSDataOutputStream = null
      try {
        out = fs.create(path, false)
        out.write(body)
        val o = out; out = null
        o.close() // S3A: the conditional PUT happens HERE
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException => false
      } finally {
        if (out != null) { try out.close() catch { case _: Exception => () } }
      }
  }
}

object ConditionalCreateArbiter {
  /** Hadoop's capability key for create-with-conditional-overwrite
    * (`Options.CreateFileOptionKeys.FS_OPTION_CREATE_CONDITIONAL_OVERWRITE`,
    * shipped in 3.4.2 with the S3A conditional-write support) — the
    * string is inlined so the arbiter still loads against older Hadoop
    * client jars, where no connector advertises it and the guard
    * correctly refuses. */
  val CapabilityKey = "fs.option.create.conditional.overwrite"
}
