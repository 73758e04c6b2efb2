package graft.util

import graft.SparkTestBase

import org.scalatest.funsuite.AnyFunSuite

/** A FileSystem whose create always fails with a non-"already exists"
  * IOException — stands in for a transient network/permission failure. */
class FaultyCreateFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  // own scheme: file:// now short-circuits to the nio O_EXCL path inside
  // createExclusive, so the faulty create must arrive via a non-file URI
  override def getUri: java.net.URI = java.net.URI.create("faulty:///")
  override def create(f: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream =
    throw new java.io.IOException("simulated transient failure")
  override def create(f: org.apache.hadoop.fs.Path, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream =
    throw new java.io.IOException("simulated transient failure")
}

class HadoopIOSpec extends AnyFunSuite with SparkTestBase {

  private def conf = spark.sessionState.newHadoopConf()

  test("writeAtomic commits via rename; no temp files remain") {
    val dir = s"$tmpDir/hio1"
    HadoopIO.writeAtomic(dir, "out.bin", conf, attemptId = 1L)(_.write("hello".getBytes))
    assert(HadoopIO.readString(s"$dir/out.bin", conf) === "hello")
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(!names.exists(_.contains("_temporary")), names.mkString(","))
  }

  test("speculative/retried attempts: loser keeps the winner's committed file") {
    val dir = s"$tmpDir/hio2"
    // attempt 1 commits first
    HadoopIO.writeAtomic(dir, "part.bin", conf, attemptId = 1L)(_.write("attempt-1".getBytes))
    // attempt 2 (same partition, later attempt id) races in afterwards —
    // the loser must never interleave bytes: exactly one whole attempt's
    // file survives and no temp files are left behind
    HadoopIO.writeAtomic(dir, "part.bin", conf, attemptId = 2L)(_.write("attempt-2".getBytes))
    val content = HadoopIO.readString(s"$dir/part.bin", conf)
    assert(content === "attempt-1" || content === "attempt-2")
    assert(content.length === 9)
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(names.count(_ == "part.bin") === 1)
    assert(!names.exists(_.contains("_temporary")), names.mkString(","))
  }

  test("a failing body leaves no partial final file") {
    val dir = s"$tmpDir/hio3"
    intercept[RuntimeException] {
      HadoopIO.writeAtomic(dir, "bad.bin", conf, attemptId = 7L) { out =>
        out.write("partial".getBytes)
        throw new RuntimeException("task died mid-write")
      }
    }
    assert(!HadoopIO.exists(s"$dir/bad.bin", conf))
    val names = Option(new java.io.File(dir).listFiles()).map(_.map(_.getName)).getOrElse(Array.empty[String])
    assert(!names.exists(_.contains("_temporary")), names.mkString(","))
  }

  test("createExclusive: lost race is false; a genuine FS error rethrows") {
    val dir = s"$tmpDir/hio4"
    val p = s"$dir/lockfile"
    assert(HadoopIO.createExclusive(p, "a", conf), "first create wins")
    assert(!HadoopIO.createExclusive(p, "b", conf), "second create loses the race")
    assert(HadoopIO.readString(p, conf) === "a", "loser must not clobber content")
    // a transient FS failure (network, permissions) must RETHROW, not be
    // reported as "lock held" — a caller would spin until timeout on a
    // phantom lock (round-3 ADVICE)
    val c2 = spark.sessionState.newHadoopConf()
    c2.set("fs.faulty.impl", classOf[FaultyCreateFs].getName)
    c2.set("fs.faulty.impl.disable.cache", "true")
    val ex = intercept[java.io.IOException] {
      HadoopIO.createExclusive(s"faulty://$dir/never/lock", "c", c2)
    }
    assert(ex.getMessage.contains("simulated transient failure"))
  }

  test("createExclusive under contention: exactly one winner per lock cycle") {
    // Hadoop's RawLocalFileSystem.create(overwrite=false) is an
    // exists()-then-open TOCTOU — two simultaneous callers could both
    // "win" (observed: a lost ImageTable append). Local paths now go
    // through nio O_EXCL; this hammers the race window.
    val dir = s"$tmpDir/hio-race"
    (1 to 50).foreach { round =>
      val p = s"$dir/lock-$round"
      val winners = new java.util.concurrent.atomic.AtomicInteger(0)
      val barrier = new java.util.concurrent.CyclicBarrier(8)
      val threads = (1 to 8).map(i => new Thread(() => {
        barrier.await()
        if (HadoopIO.createExclusive(p, s"t$i", conf)) winners.incrementAndGet()
      }))
      threads.foreach(_.start())
      threads.foreach(_.join())
      assert(winners.get === 1, s"round $round: ${winners.get} winners")
    }
  }

  test("SerializableHadoopConf round-trips custom settings through Java serialization") {
    val c = spark.sessionState.newHadoopConf()
    c.set("graft.test.key", "value-42")
    val wrapped = new SerializableHadoopConf(c)
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(wrapped)
    val back = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[SerializableHadoopConf]
    assert(back.value.get("graft.test.key") === "value-42")
  }
}
