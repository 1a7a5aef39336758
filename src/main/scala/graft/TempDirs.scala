package graft

/** Session-scoped temp dirs for pipeline-local graft-doc tables (the CDC /
  * sink parity pipelines write real tables per run): tracked and
  * recursively deleted at JVM exit. Exit-time — not eager — cleanup,
  * because several pipelines return LAZY plans over these dirs (snapshot
  * reads) that the caller materializes after the pipeline function
  * returns; by JVM exit they are long consumed. Verify/Bench run one JVM
  * per invocation, so this bounds /tmp growth across repeated runs — the
  * same hygiene the streaming checkpoints already get eagerly.
  */
private[graft] object TempDirs {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.forEach(delete(_))
  }))

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete(); ()
  }

  /** Create a tracked temp directory; returns its absolute path. */
  def create(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    dirs.add(d)
    d.getAbsolutePath
  }
}
