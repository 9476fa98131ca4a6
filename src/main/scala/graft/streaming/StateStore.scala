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
  * the lock, SURVEY §2.9).
  *
  * `ttl` mirrors the reference's store-level token expiry (`SET [EX ttl]`,
  * redis.rs:597-612): every save stamps an expiry, enforced lazily on
  * get/list. `now` is injectable for tests. */
final class MemoryStateStore(
    ttl: Option[java.time.Duration] = None,
    now: () => Long = () => System.currentTimeMillis()) extends StateStore {
  private val tokens = TrieMap.empty[String, (String, Long)] // token, expiresAt (Long.MaxValue = never)
  private def expiresAt(): Long =
    ttl.map(d => now() + d.toMillis).getOrElse(Long.MaxValue)
  override def saveToken(key: String, token: String): Unit =
    tokens(key) = (token, expiresAt())
  override def getToken(key: String): Option[String] =
    tokens.get(key) match {
      case Some((t, exp)) if exp > now() => Some(t)
      case Some(stale) =>
        // conditional remove: reap only the entry we observed as expired, so
        // a concurrent saveToken racing this reap is never deleted
        tokens.remove(key, stale); None
      case None => None
    }
  override def deleteToken(key: String): Unit = tokens.remove(key)
  override def listTokens(): Map[String, String] = {
    val t = now()
    tokens.collect { case (k, (v, exp)) if exp > t => k -> v }.toMap
  }
}

/** ST3 — durable store: one file per token under a directory that would be
  * shared storage (HDFS/S3/NFS) on a cluster — the role Redis plays for the
  * reference (redis.rs:581-777). Writes are atomic (temp file + move) so a
  * crash mid-save never leaves a torn token, matching the all-or-nothing
  * guarantee of Redis SET.
  *
  * `ttl` is Redis `SET EX` parity (redis.rs:597-612): the expiry rides in
  * the token file as a `ttl:<epochMillis>\n` header (one atomic move, no
  * sidecar to tear) and is enforced lazily — an expired token is invisible
  * to get/list and its file is reaped on first touch. Stale-token cleanup
  * matters for long-lived multi-collection deployments where collections
  * come and go. */
final class FileStateStore(
    dir: String,
    ttl: Option[java.time.Duration] = None,
    now: () => Long = () => System.currentTimeMillis()) extends StateStore {
  private val root = Paths.get(dir)
  Files.createDirectories(root)

  private def fileFor(key: String): java.nio.file.Path =
    root.resolve(java.net.URLEncoder.encode(key, "UTF-8"))

  override def saveToken(key: String, token: String): Unit = {
    val payload = ttl match {
      case Some(d) => s"ttl:${now() + d.toMillis}\n$token"
      case None    => token
    }
    val tmp = Files.createTempFile(root, ".tok", ".tmp")
    Files.write(tmp, payload.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, fileFor(key), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Token if live; None (and file reaped) if the header says expired. */
  private def readLive(f: java.nio.file.Path): Option[String] = {
    val raw = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
    if (!raw.startsWith("ttl:")) Some(raw)
    else {
      val nl = raw.indexOf('\n')
      val exp = raw.substring(4, if (nl < 0) raw.length else nl).toLongOption
      exp match {
        case Some(e) if e <= now() => Files.deleteIfExists(f); None
        case Some(_)               => Some(raw.substring(nl + 1))
        case None                  => Some(raw) // not our header; raw token
      }
    }
  }

  override def getToken(key: String): Option[String] = {
    val f = fileFor(key)
    if (Files.exists(f)) readLive(f) else None
  }
  override def deleteToken(key: String): Unit =
    Files.deleteIfExists(fileFor(key))
  override def listTokens(): Map[String, String] = {
    // Files.list holds a directory handle until CLOSED — a polling caller
    // would otherwise leak one fd per call until unrelated I/O dies with
    // "Too many open files"
    val stream = Files.list(root)
    try stream.iterator().asScala
      .filterNot(_.getFileName.toString.startsWith(".tok"))
      .flatMap { f =>
        readLive(f).map(
          java.net.URLDecoder.decode(f.getFileName.toString, "UTF-8") -> _)
      }.toMap
    finally stream.close()
  }
}
