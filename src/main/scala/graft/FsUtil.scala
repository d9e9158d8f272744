package graft

/** Tiny local-filesystem helper shared by the driver-side harness
  * (answer-key cleanup, x24's temp staging dir). Driver-local only —
  * production tables go through Hadoop FileSystem in ExtractJob. */
object FsUtil {
  /** Scratch directory for a protocol query's committed tables: RAM-backed
    * (/dev/shm) when available — local shuffle/stage I/O through a
    * spinning /tmp serializes on disk, which a real cluster's executor
    * disks would not — else the platform temp dir. Caller deletes via
    * [[deleteRecursively]]. */
  def scratchDir(prefix: String): String = {
    val shm = new java.io.File("/dev/shm")
    (if (shm.isDirectory && shm.canWrite)
       java.nio.file.Files.createTempDirectory(shm.toPath, prefix)
     else java.nio.file.Files.createTempDirectory(prefix)).toString
  }

  /** Recursive delete. A directory symlink is deleted as a LINK, never
    * traversed (ADVICE r4: File.listFiles follows links, so a symlink
    * planted inside a temp dir would have had its TARGET's files deleted). */
  def deleteRecursively(f: java.io.File): Unit = {
    if (!java.nio.file.Files.isSymbolicLink(f.toPath)) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(deleteRecursively)
    }
    f.delete()
    ()
  }
}
