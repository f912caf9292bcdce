package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared Hadoop-FS text I/O (one place for the open/copyBytes/close idiom —
  * Savepoint's log rebase and the sink's manifest recovery both need it).
  */
object FsText {
  def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 65536, false)
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** Write a small text file through the session's Hadoop FS (works on any
    * supported filesystem URI, spaces included — the r5 raw-URI lesson).
    */
  def write(spark: org.apache.spark.sql.SparkSession, path: String,
      text: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }

  /** Atomically publish a small text file: write a sibling temp, then the
    * single rename IS the visibility point (the sink's manifest rule).
    */
  def writeAtomic(fs: FileSystem, p: Path, text: String): Unit = {
    val tmp = new Path(p.getParent, s".tmp-${p.getName}")
    val out = fs.create(tmp, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"atomic publish failed for $p")
  }

  /** `writeAtomic` for a destination that may already EXIST with different
    * content (Hadoop's FileSystem.rename refuses an existing destination on
    * several implementations, local FS included). Falls back to
    * delete-then-rename: a crash in that gap leaves a MISSING file — a loud
    * read failure — never a torn or half-old one (r7, the IVF sidecar fix).
    */
  def writeAtomicOverwrite(fs: FileSystem, p: Path, text: String): Unit = {
    val tmp = new Path(p.getParent, s".tmp-${p.getName}")
    val out = fs.create(tmp, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, p)) {
      fs.delete(p, false)
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(s"atomic publish failed for $p")
    }
  }
}
