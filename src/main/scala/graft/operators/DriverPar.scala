package graft.operators

/** Overlap INDEPENDENT driver-side job chains (guide §2.6): Spark's
  * scheduler happily runs several jobs at once inside one application —
  * actions are only sequential because driver code calls them
  * sequentially. The iterative operators here (CC level sweeps,
  * per-threshold closures) are chains of micro-stage jobs measured at
  * 0.03–0.14 task occupancy, so running a few chains concurrently
  * back-fills each other's scheduling gaps without contending for
  * executor slots.
  *
  * Deterministic by construction: results come back in INPUT order
  * (futures are awaited in sequence), and each item's own chain runs on
  * one thread in program order. Job submission from multiple driver
  * threads is a supported Spark pattern; job-description/group
  * properties are thread-local, so concurrent chains don't clobber each
  * other's labels. A failure in any item propagates (Await rethrows).
  */
object DriverPar {

  /** 2-3 chains in flight is plenty (enough to fill the tail, not so
    * many that they fight) — the guide's own sizing. */
  val Width = 3

  def map[A, B](items: Seq[A], width: Int = Width)(f: A => B): Seq[B] = {
    if (items.size <= 1) return items.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(width, items.size))
    try {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutor(pool)
      items.map(a => Future(f(a))).map(Await.result(_, Duration.Inf))
    } finally { pool.shutdown(); () }
  }
}
