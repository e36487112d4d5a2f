package graft

/** Log reopen — the reference's logrotate integration
  * (logging/logger.go:39 `Reopen()`: on the reload signal, close and
  * reopen every log file so an external rotation can move the old file
  * away and the daemon starts a fresh one at the configured path).
  * graft logs through log4j2, so the equivalent is a LoggerContext
  * reconfigure: every appender's stream is closed and recreated, and a
  * rotated-away file reappears at its configured path. [[Daemon.reload]]
  * invokes it so ONE reload signal refreshes both the rollup config and
  * the log handles (cassabon.go's signal handler does both);
  * Round13Spec drives a real move-then-reopen cycle against a temp-file
  * appender.
  *
  * Scope note (vs the reference's per-file Reopen): the stop/start cycle
  * tears down EVERY appender for the duration of the swap, so log events
  * emitted concurrently by live HTTP/ingest/Spark threads during that
  * window are dropped rather than queued — a deliberate trade: log4j2's
  * refcount-cached FileManagers make a narrower file-appender-only swap
  * acquire the OLD fd (see below), and a reload is a rare, operator-
  * driven event where a few lost in-flight log lines are acceptable
  * (logrotate itself loses lines from non-reopened writers).
  */
object Logging {
  def reopen(): Unit = {
    // reconfigure() alone does NOT reopen files: log4j2's FileManagers are
    // refcount-cached by file name, and the new configuration acquires the
    // OLD manager (and its fd) before the old configuration releases it —
    // so the stream to a rotated-away file survives. A stop/start cycle
    // drops every manager's refcount to zero (closing the fds) and the
    // restart rebuilds appenders from the same config location with fresh
    // streams at the configured paths — the logger.go Reopen semantics.
    val ctx = org.apache.logging.log4j.core.LoggerContext.getContext(false)
    ctx.stop()
    ctx.start()
  }
}
