package graft.util

/** Env-gated phase timer (`GRAFT_PROF=1`): prints `[prof] tag t` lines
  * for wrapped engine phases. Off by default — one cached boolean test
  * per call site — so the hooks can stay in the write path permanently
  * and optimization rounds can re-attribute a regression in minutes.
  */
object Prof {
  val on: Boolean = sys.env.contains("GRAFT_PROF")
  @inline def apply[T](tag: => String)(body: => T): T =
    if (!on) body
    else {
      val t0 = System.nanoTime()
      try body
      finally println(f"[prof] ${(System.nanoTime() - t0) / 1e9}%7.3f s  $tag")
    }
}
