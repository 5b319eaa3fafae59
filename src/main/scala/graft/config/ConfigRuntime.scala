package graft.config

import org.apache.spark.sql.SparkSession

/** Daemon-lifecycle analog over the config compiler — `syslog_ng.start
  * / reload / stop` in the reference's python harness map to compile /
  * recompile / teardown here, and each transition emits the reference's
  * mainloop notice through the internal() surface:
  *
  *  - start  → "syslog-ng starting up" (`lib/mainloop.c:658`)
  *  - reload → "Configuration reload finished"
  *    (`lib/mainloop-worker.c:385`; the request-received notice at
  *    `mainloop.c:300` precedes it)
  *  - stop   → "syslog-ng shutting down" (`lib/mainloop.c:460`)
  *
  * A reload is a fresh compile of the (possibly edited) text against
  * the same SparkSession — state identity across reloads is the
  * persist-name → checkpoint-path contract
  * (graft.operators.Sessions.persistCheckpoint), and socket listeners'
  * spools are durable across recompiles, so in-flight connections keep
  * their per-connection aux data (the proxy-protocol battery's
  * test_pp_reload.py rides this).
  */
object ConfigRuntime {

  /** Compile `text` and emit the starting-up notice. Returns the routes
    * plus listener handles, like
    * [[ConfigCompiler.compileStreamingPipeline]]. */
  def start(text: String, spark: SparkSession, spoolBase: String):
      (Seq[ConfigCompiler.Route],
       Map[String, graft.streaming.SocketListener]) = {
    val r = ConfigCompiler.compileStreamingPipeline(
      ConfigParser.parse(text), spark, spoolBase)
    graft.streaming.Internal.lifecycle("syslog-ng starting up")
    r
  }

  /** Recompile (possibly edited) config text — the reference's SIGHUP
    * path: request-received notice, rebuild, reload-finished notice. A
    * compile failure emits no finished notice (the reference keeps the
    * old config running; callers keep their old routes). */
  def reload(text: String, spark: SparkSession, spoolBase: String):
      (Seq[ConfigCompiler.Route],
       Map[String, graft.streaming.SocketListener]) = {
    graft.streaming.Internal.lifecycle(
      "Configuration reload request received, reloading configuration")
    val r = ConfigCompiler.compileStreamingPipeline(
      ConfigParser.parse(text), spark, spoolBase)
    graft.streaming.Internal.lifecycle("Configuration reload finished")
    r
  }

  /** Emit the shutting-down notice (listener/query teardown stays with
    * the caller, which owns the handles). */
  def stop(): Unit =
    graft.streaming.Internal.lifecycle("syslog-ng shutting down")
}
