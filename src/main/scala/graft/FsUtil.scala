package graft

/** Tiny local-filesystem helper shared by the driver-side harness
  * (answer-key cleanup, x24's temp staging dir). Driver-local only —
  * production tables go through Hadoop FileSystem in ExtractJob. */
object FsUtil {
  /** Recursive delete. Callers pass directories they created themselves
    * (no symlinks into foreign trees). */
  def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete()
    ()
  }
}
