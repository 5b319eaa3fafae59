package graft.pipeline

/** Dev micro-bench (optimization r15): per-clip cost of the GIF
  * fixture ENCODE (MediaFixtures.gifFrames), the LZW frame DECODE
  * (MediaSamples.decodeGifFrames) and the per-frame dHash — the three
  * JVM passes every video-family query pays per row. Used to attribute
  * the dedup_video_* / multimodal_video* / multimodal_gif bench cost
  * between fixture generation, decode and hashing before touching any
  * of them (guide §1: measure first).
  */
object MicroMedia {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    // the exact videoHashFixtures recipe
    def clip(id: Long): Array[Byte] = {
      val eid = if (id % 10 == 1 || id % 10 == 6) id - 1 else id
      val off = if (id % 10 == 6) 2 else 0
      val m = (eid * 2654435761L) % 4294967296L
      val a = 1 + (m % 251).toInt
      val b = 1 + ((m / 251) % 241).toInt
      val w = 12 + (m % 21).toInt
      val h = 10 + ((m / 21) % 17).toInt
      val nf = 5 + 2 * (m % 3).toInt
      MediaFixtures.gifFrames(w, h, nf, (f, x, y) =>
        (a * (x * x + 3 * y) + b * (y * y + 5 * x) +
          x * y * (x + y) + (f + 1) * (x + 2 * y + 7)) % 250 + off)
    }
    def dims(id: Long): (Int, Int) = {
      val eid = if (id % 10 == 1 || id % 10 == 6) id - 1 else id
      val m = (eid * 2654435761L) % 4294967296L
      (12 + (m % 21).toInt, 10 + ((m / 21) % 17).toInt)
    }
    var sink = 0L
    // warmup
    for (i <- 0L until 500L) {
      val b = clip(i)
      val fs = MediaSamples.decodeGifFrames(b, 64)
      val (w, h) = dims(i)
      if (fs != null) fs.foreach(f => sink += Multimodal.dhashBitsOf(f, w, h))
    }
    for (rep <- 0 until 5) {
      val t0 = System.nanoTime()
      val clips = Array.tabulate(n)(i => clip(i.toLong))
      val t1 = System.nanoTime()
      val frames = clips.map(MediaSamples.decodeGifFrames(_, 64))
      val t2 = System.nanoTime()
      var i = 0
      while (i < n) {
        val (w, h) = dims(i.toLong)
        val fs = frames(i)
        if (fs != null) {
          var j = 0
          while (j < fs.length) {
            sink += Multimodal.dhashBitsOf(fs(j), w, h); j += 1
          }
        }
        i += 1
      }
      val t3 = System.nanoTime()
      println(f"rep $rep: encode ${(t1 - t0) / 1e6}%.1f ms  decode ${(t2 - t1) / 1e6}%.1f ms  dhash ${(t3 - t2) / 1e6}%.1f ms  / $n clips")
    }
    println(sink)

    // PNG leg: the dhashFixtures recipe (still-image family)
    def png(id: Long): Array[Byte] = {
      val eid = if (id % 10 == 1 || id % 10 == 6) id - 1 else id
      val off = if (id % 10 == 6) 2 else 0
      val m = (eid * 2654435761L) % 4294967296L
      val a = 1 + (m % 251).toInt
      val b = 1 + ((m / 251) % 241).toInt
      val w = 12 + (m % 21).toInt
      val h = 10 + ((m / 21) % 17).toInt
      MediaFixtures.pngPixels(w, h, (x, y) =>
        (a * (x * x + 3 * y) + b * (y * y + 5 * x) +
          x * y * (x + y)) % 250 + off)
    }
    for (i <- 0L until 500L) { val d = MediaSamples.decode(png(i)); if (d != null) sink += d.samples.length }
    for (rep <- 0 until 5) {
      val t0 = System.nanoTime()
      val pngs = Array.tabulate(n)(i => png(i.toLong))
      val t1 = System.nanoTime()
      var i = 0
      while (i < n) {
        val d = MediaSamples.decode(pngs(i))
        if (d != null) sink += d.samples(0)
        i += 1
      }
      val t2 = System.nanoTime()
      println(f"png rep $rep: encode ${(t1 - t0) / 1e6}%.1f ms  decode ${(t2 - t1) / 1e6}%.1f ms  / $n images")
    }
    println(sink)
  }
}
