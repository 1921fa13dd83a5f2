package graft.core

/** The one recursive-delete helper — shared by every temp-dir/warehouse
  * cleanup site so deletion semantics can't drift between copies. */
object Fs {
  def rmTree(p: java.io.File): Unit = {
    Option(p.listFiles()).foreach(_.foreach(rmTree)); p.delete(); ()
  }
}
