package graft.store

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Models a MIS-PROVISIONED object-store connector: an object-store
  * scheme (`cos://`, in [[CommitArbiter.NonAtomicSchemes]]) that
  * neither implements [[AtomicCommit]] nor advertises the
  * conditional-create capability — the S3A-on-old-Hadoop shape where
  * `create(overwrite = false)` is exists-check + unconditional PUT.
  * The `conditional` arbiter must REFUSE this connector loudly instead
  * of silently degrading to advisory behavior. */
class UnverifiedObjectStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "cos"
  override def getUri: URI = URI.create("cos:///")
}

/** Models a connector that ADVERTISES conditional-create support
  * through `hasPathCapability` (S3A from the Hadoop release that added
  * conditional writes) — the `conditional` arbiter's capability probe
  * must accept it. */
class AdvertisingObjectStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "oss"
  override def getUri: URI = URI.create("oss:///")
  override def hasPathCapability(path: Path, capability: String): Boolean =
    capability == ConditionalCreateArbiter.CapabilityKey ||
      super.hasPathCapability(path, capability)
}
