package graft.tools

object FsProbe {
  def main(args: Array[String]): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = new org.apache.hadoop.fs.Path("/tmp/fsprobe/lock")
    val fs = p.getFileSystem(conf)
    println(s"fs class: ${fs.getClass.getName}")
    println(s"is LocalFileSystem: ${fs.getClass == classOf[org.apache.hadoop.fs.LocalFileSystem]}")
    println(s"uri: ${p.toUri} path: ${p.toUri.getPath}")
  }
}
