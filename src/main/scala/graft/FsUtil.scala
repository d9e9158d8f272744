package graft

/** Tiny local-filesystem helper shared by the driver-side harness
  * (answer-key cleanup, x24's temp staging dir). Driver-local only —
  * production tables go through Hadoop FileSystem in ExtractJob. */
object FsUtil {
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
