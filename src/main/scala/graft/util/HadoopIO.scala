package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import java.io.{ObjectInputStream, ObjectOutputStream, OutputStream}

/** Hadoop `Configuration` is not `Serializable`; this wrapper ships the
  * session's conf (S3 credentials, endpoints, etc.) from driver to executor
  * tasks the same way Spark's own readers do — `Configuration.write/readFields`
  * through Java serialization. Always pass the session conf
  * (`spark.sessionState.newHadoopConf()`) instead of `new Configuration()`,
  * which silently drops user settings on a real cluster.
  */
final class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** Cluster-safe file IO through the Hadoop FileSystem API (works on local
  * FS, HDFS, S3A alike), replacing `java.io.File`/`java.nio.file.Files`
  * call sites that only work when every executor shares the driver's disk.
  */
object HadoopIO {

  /** Write `fileName` under `dir` atomically: stream to an attempt-scoped
    * temp path, rename into place on success. Safe against retried and
    * speculative tasks — the loser of a rename race deletes its temp file
    * and keeps the winner's output (both attempts produce identical bytes
    * for a deterministic partition).
    */
  def writeAtomic(dir: String, fileName: String, conf: Configuration,
      attemptId: Long)(body: OutputStream => Unit): Unit = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf)
    fs.mkdirs(dirPath)
    val tmp = new Path(dirPath, s"_temporary-$fileName-attempt-$attemptId")
    val dst = new Path(dirPath, fileName)
    val out = fs.create(tmp, true)
    var ok = false
    try {
      body(out)
      out.close()
      ok = true
    } finally {
      if (!ok) {
        try out.close() catch { case _: Exception => () }
        fs.delete(tmp, false)
      }
    }
    if (!fs.rename(tmp, dst)) {
      // another attempt committed first (speculation/retry): keep its file
      fs.delete(tmp, false)
      if (!fs.exists(dst))
        throw new java.io.IOException(s"rename $tmp -> $dst failed and no committed file exists")
    }
  }

  def writeString(path: String, content: String, conf: Configuration): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Replace `path`'s content atomically: write a sibling temp file, then
    * FileContext.rename(OVERWRITE) — readers see the old bytes or the new,
    * never a truncated prefix. Plain writeString truncates FIRST (fs.create
    * overwrite=true), so a concurrent reader of, e.g., a table's `current`
    * pointer could read "" or a prefix of the old value, and a crash
    * between truncate and write loses the pointer entirely. */
  def replaceStringAtomic(path: String, content: String, conf: Configuration): Unit = {
    val dst = new Path(path)
    val tmp = new Path(dst.getParent, s".${dst.getName}.tmp-${java.util.UUID.randomUUID()}")
    writeString(tmp.toString, content, conf)
    try org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
      .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    catch { case e: Exception =>
      try dst.getFileSystem(conf).delete(tmp, false) catch { case _: Exception => () }
      throw e
    }
  }

  def readString(path: String, conf: Configuration): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      buf.toString("UTF-8")
    } finally in.close()
  }

  /** Create `path` exclusively (overwrite=false): returns true iff THIS
    * call created it. Atomic on HDFS (the namenode create either wins or
    * throws) and on the local FS — where Hadoop's own
    * `RawLocalFileSystem.create(overwrite=false)` is an exists()-then-open
    * TOCTOU race (two concurrent callers can BOTH "win"; observed as a
    * lost ImageTable append under the full test suite's load), so local
    * paths go through `java.nio.Files.createFile`, a true O_EXCL. S3A has
    * no atomic create — on object stores, slot a real catalog/lock service
    * into the seam that calls this.
    *
    * Only "already exists" maps to `false`; any other IOException (missing
    * parent permissions, network failure) RETHROWS — a transient FS error
    * must not be indistinguishable from "lock held", or a caller spins on a
    * lock that never existed (round-3 ADVICE). The message fallback covers
    * FileSystem impls that signal the lost race with a plain IOException. */
  def createExclusive(path: String, content: String, conf: Configuration): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    // scheme-based, not class-based: Spark's Hive jars register
    // ProxyLocalFileSystem for file://, so no class allowlist survives —
    // but anything resolving through the file scheme IS posix disk, where
    // nio gives a true O_EXCL
    val effScheme = Option(p.toUri.getScheme).getOrElse(fs.getUri.getScheme)
    val localToctou = effScheme == null || effScheme == "file"
    try {
      if (localToctou) {
        val nio = java.nio.file.Paths.get(p.toUri.getPath match {
          case "" => p.toString
          case abs => abs
        })
        Option(nio.getParent).foreach(java.nio.file.Files.createDirectories(_))
        // CREATE_NEW: O_EXCL create and content write through ONE channel on
        // the created inode — a separate Files.write would resolve by PATH,
        // so a holder stalled between create and write could overwrite a
        // waiter's freshly acquired lock file after a stale-break
        val ch = java.nio.file.Files.newByteChannel(nio,
          java.nio.file.StandardOpenOption.WRITE,
          java.nio.file.StandardOpenOption.CREATE_NEW)
        try ch.write(java.nio.ByteBuffer.wrap(
          content.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        finally ch.close()
      } else {
        val out = fs.create(p, false)
        try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.nio.file.FileAlreadyExistsException => false
      // HDFS signals a concurrent-create race on a still-open file with
      // AlreadyBeingCreatedException ("already being created") — also a
      // lost race, not an error (matched by message: the hdfs-client class
      // isn't a compile-time dependency here)
      case e: java.io.IOException if e.getMessage != null && {
        val m = e.getMessage.toLowerCase
        m.contains("already exists") || m.contains("already being created")
      } => false
    }
  }

  def modificationTime(path: String, conf: Configuration): Long = {
    val p = new Path(path)
    p.getFileSystem(conf).getFileStatus(p).getModificationTime
  }

  def exists(path: String, conf: Configuration): Boolean = {
    val p = new Path(path)
    p.getFileSystem(conf).exists(p)
  }

  def delete(path: String, conf: Configuration): Boolean = {
    val p = new Path(path)
    p.getFileSystem(conf).delete(p, true)
  }

  def fileSystem(path: String, conf: Configuration): FileSystem =
    new Path(path).getFileSystem(conf)
}
