package graft

import graft.operators.Multimodal

/** Single-JVM micro-probe of the audio gates' per-row kernel: times
  * each stage (sample gen, WAV encode, WAV decode, decimal digest,
  * histogram) in isolation over the same id population the gates
  * process, so a digest-contract change is driven by measurement
  * instead of guesswork (the r12→r13 SCALEBENCH candidate: the pair
  * cost ~220 s at 100×). No Spark session — the stages are pure
  * per-row JVM work and the suite's 32 threads scale them linearly.
  *
  * Usage: runMain graft.AudioKernelProbe [nRows]
  */
object AudioKernelProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 20000
    val ids = Array.tabulate(n)(i => (i * 3 + 1).toLong) // doc_id % 3 == 1
    val md = java.security.MessageDigest.getInstance("MD5")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[audio-probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
      r
    }

    // stage 1: sample generation (the synthetic fixture's cost)
    val samples = time("gen-samples") {
      ids.map(id => Array.tabulate((400 + Math.floorMod(id, 7L) * 100).toInt)(
        i => Multimodal.synthSample(id, i)))
    }
    // stage 2: WAV encode through the JDK codec (fixture build cost)
    val wavs = time("encode-wav") { samples.map(s => Multimodal.encodeWavPcm16(s)) }
    // stage 3: WAV decode through the JDK codec (the REAL gate work)
    val decoded = time("decode-wav") { wavs.map(Multimodal.decodeWavPcm16) }
    // stage 4a: the r12 digest contract — comma-joined decimal md5
    time("digest-decimal") {
      decoded.foreach { case (_, _, smp) =>
        md.reset(); md.digest(smp.mkString(",").getBytes("UTF-8"))
      }
    }
    // stage 4b: sum + histogram (the features gate's arithmetic)
    time("hist+sum") {
      decoded.foreach { case (_, _, smp) =>
        val counts = new Array[Long](64)
        var s = 0L; var i = 0
        while (i < smp.length) { counts((smp(i) + 32768) * 64 / 65536) += 1L; s += smp(i); i += 1 }
      }
    }
    // concurrency probe: the gates run these kernels on 32 executor
    // threads — a JDK-internal lock (sound SPI registries synchronize)
    // would collapse that parallelism and explain a wall-clock far
    // above rows × per-row cost / threads
    def onPool[A](threads: Int, work: Seq[() => A]): Unit = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      try {
        val futs = work.map(w => pool.submit(new java.util.concurrent.Callable[A] {
          def call(): A = w()
        }))
        futs.foreach(_.get())
      } finally pool.shutdown()
    }
    for (threads <- Seq(4, 32)) {
      time(s"encode-only x$threads") {
        onPool(threads, samples.toSeq.map(s => () => Multimodal.encodeWavPcm16(s).length))
      }
      time(s"decode-only x$threads") {
        onPool(threads, wavs.toSeq.map(w => () => Multimodal.decodeWavPcm16(w)._3.length))
      }
    }
    // which reader wins, and where does decode time go?
    val readers = {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
      var out = List.empty[javax.sound.sampled.spi.AudioFileReader]
      while (it.hasNext) out = it.next() :: out
      out.reverse
    }
    println(s"[audio-probe] readers in SPI order: ${readers.map(_.getClass.getSimpleName)}")
    val wave = readers.find { r =>
      try { r.getAudioInputStream(new java.io.ByteArrayInputStream(wavs(0))); true }
      catch { case _: Exception => false }
    }.get
    println(s"[audio-probe] wave reader: ${wave.getClass.getName}")
    for (threads <- Seq(1, 32)) {
      time(s"ais-open-direct x$threads") {
        onPool(threads, wavs.toSeq.map(w => () => {
          wave.getAudioInputStream(new java.io.ByteArrayInputStream(w)).getFormat
        }))
      }
      time(s"ais-read-direct x$threads") {
        onPool(threads, wavs.toSeq.map(w => () => {
          val ais = wave.getAudioInputStream(new java.io.ByteArrayInputStream(w))
          ais.readAllBytes().length
        }))
      }
    }
  }
}
