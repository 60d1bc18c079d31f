package graft

/** Shared recursive delete for the scratch directories the
  * bench/demo/rehearsal mains and the artifact warehouse manage —
  * one definition instead of the five inline copies that had
  * accumulated (any future hardening, e.g. symlink handling or
  * delete-failure reporting, lands in one place).
  */
object FsUtil {
  def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(rmTree)); f.delete(); ()
  }
}
