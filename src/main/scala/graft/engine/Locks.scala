package graft.engine

/** Cross-process advisory file locking shared by the durable registry and
  * the backfill manifest store — anywhere two DRIVERS may read-modify-write
  * the same on-disk state (the reference's file registry has no writer
  * lock at all; two `feast apply` runs can last-writer-win).
  */
private[graft] object Locks {

  /** One cached, never-closed channel per lock path per JVM. POSIX fcntl
    * record locks are per-PROCESS, per-FILE: closing ANY descriptor on the
    * file drops every lock the process holds on it (the documented
    * [[java.nio.channels.FileLock]] hazard), so an open/lock/close-per-call
    * scheme lets thread B's failed claim silently void thread A's held
    * lock. Keeping exactly one long-lived channel per path removes every
    * close() from the locking hot path. The cache is tiny — one entry per
    * manifest/registry file a driver touches.
    */
  private val channels =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.channels.FileChannel]()

  private def channelFor(path: String): java.nio.channels.FileChannel = {
    val target = java.nio.file.Paths.get(path)
    Option(target.getParent).foreach(java.nio.file.Files.createDirectories(_))
    val lockPath = target.resolveSibling(target.getFileName.toString + ".lock")
    channels.computeIfAbsent(lockPath.toAbsolutePath.toString, p =>
      java.nio.channels.FileChannel.open(java.nio.file.Paths.get(p),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE))
  }

  /** Blocking OS [[java.nio.channels.FileLock]] on the sibling
    * `<name>.lock` file — never the target itself (locking the target
    * would race with atomic-rename writers). Same-JVM overlap (the JDK
    * throws [[java.nio.channels.OverlappingFileLockException]] instead of
    * blocking there) retries with a short sleep, so two threads of one
    * driver serialize exactly like two separate drivers.
    */
  def withFileLock[T](path: String)(body: => T): T = {
    val ch = channelFor(path)
    var lock: java.nio.channels.FileLock = null
    while (lock == null) {
      try lock = ch.lock()
      catch {
        case _: java.nio.channels.OverlappingFileLockException =>
          Thread.sleep(10)
      }
    }
    try body
    finally lock.release()
  }

  /** Non-blocking variant: run `body` only if the lock is free RIGHT NOW,
    * else return None without waiting. The work-sharing primitive — a
    * driver that finds a partition claimed moves on to the next one
    * instead of queueing behind the claimant (same-JVM overlap counts as
    * busy, like a second process would).
    */
  def withTryFileLock[T](path: String)(body: => T): Option[T] = {
    val ch = channelFor(path)
    val lock =
      try ch.tryLock()
      catch { case _: java.nio.channels.OverlappingFileLockException => null }
    if (lock == null) None
    else {
      try Some(body)
      finally lock.release()
    }
  }
}
