package graft

/** Dev micro-bench: per-line cost of the syslog line parser (used to
  * attribute the r9 msgparse-port delta on the parse-family bench). */
object MicroParse {
  def main(args: Array[String]): Unit = {
    val lines = (0 until 100000).map { i =>
      s"<38>Jan 12 03:04:0${i % 10} host$i app[${i % 977}]: message body $i with some text k=v"
    }.toArray
    var sink = 0L
    for (_ <- 0 until 3; l <- lines) {
      val p = graft.functions.SyslogLineParser.parse(l, 2024); sink += p.pri
    }
    for (rep <- 0 until 5) {
      val t0 = System.nanoTime()
      for (l <- lines) {
        val p = graft.functions.SyslogLineParser.parse(l, 2024); sink += p.pri
      }
      val dt = System.nanoTime() - t0
      println(f"rep $rep: ${dt / 1e6}%.1f ms / 100k lines = ${dt / 100000.0}%.0f ns/line")
    }
    println(sink)
  }
}
