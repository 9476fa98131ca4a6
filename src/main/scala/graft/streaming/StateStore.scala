package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Resume-token state store (rigatoni-core/src/state.rs:109-152, ST1).
  *
  * Structured Streaming's checkpoint directory already persists offsets
  * (the real resume mechanism — CdcPipeline never calls this); this facade
  * exists for library users who carry EXTERNAL positions through
  * `foreachBatch` — e.g. committing a vendor cursor after a successful
  * flush, the reference's token-save-after-write protocol
  * (pipeline.rs:1756-1763). Key scheme mirrors watch_level.rs:339-353.
  */
trait StateStore extends AutoCloseable {
  def saveToken(key: String, token: String): Unit
  def getToken(key: String): Option[String]
  def deleteToken(key: String): Unit
  def listTokens(): Map[String, String]
  override def close(): Unit = ()
}

object StateStore {
  /** watch_level.rs:339-353 key scheme. */
  def collectionKey(db: String, coll: String): String = s"resume_token:$db:$coll"
  def databaseKey(db: String): String = s"resume_token:database:$db"
  val deploymentKey: String = "resume_token:deployment"
}

/** ST2 — in-memory store (rigatoni-stores/src/memory.rs:134-258): process
  * lifetime only; lock operations in the reference's MemoryStore are no-ops
  * and are omitted entirely here (Spark's one-query-per-checkpoint rule is
  * the lock, SURVEY §2.9). */
final class MemoryStateStore extends StateStore {
  private val tokens = TrieMap.empty[String, String]
  override def saveToken(key: String, token: String): Unit = tokens(key) = token
  override def getToken(key: String): Option[String] = tokens.get(key)
  override def deleteToken(key: String): Unit = tokens.remove(key)
  override def listTokens(): Map[String, String] = tokens.toMap
}

/** ST3 — durable store: one file per token under a directory that would be
  * shared storage (HDFS/S3/NFS) on a cluster — the role Redis plays for the
  * reference (redis.rs:581-777). Writes are atomic (temp file + move) so a
  * crash mid-save never leaves a torn token, matching the all-or-nothing
  * guarantee of Redis SET. */
final class FileStateStore(dir: String) extends StateStore {
  private val root = Paths.get(dir)
  Files.createDirectories(root)

  private def fileFor(key: String): java.nio.file.Path =
    root.resolve(java.net.URLEncoder.encode(key, "UTF-8"))

  override def saveToken(key: String, token: String): Unit = {
    val tmp = Files.createTempFile(root, ".tok", ".tmp")
    Files.write(tmp, token.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, fileFor(key), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
  override def getToken(key: String): Option[String] = {
    val f = fileFor(key)
    if (Files.exists(f))
      Some(new String(Files.readAllBytes(f), StandardCharsets.UTF_8))
    else None
  }
  override def deleteToken(key: String): Unit =
    Files.deleteIfExists(fileFor(key))
  override def listTokens(): Map[String, String] =
    Files.list(root).iterator().asScala
      .filterNot(_.getFileName.toString.startsWith(".tok"))
      .map { f =>
        java.net.URLDecoder.decode(f.getFileName.toString, "UTF-8") ->
          new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      }.toMap
}
