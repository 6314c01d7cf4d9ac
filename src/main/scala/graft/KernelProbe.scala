package graft

import java.util.concurrent.atomic.AtomicLong

import graft.ann.{IVFIndex, RaBitQ}

/** Roofline probe for the ANN estimate kernel (SURVEY §6): how far
  * does the LUT estimate loop sit from machine memory bandwidth at the
  * reference shape (d=1536)? Three measurements, all multithreaded on
  * the same thread count:
  *
  *   1. `stream_gbps` — straight streaming sum over long arrays far
  *      beyond LLC: the machine's practical read bandwidth ceiling.
  *   2. `entry_*` — the r10 scan layout: one Entry OBJECT per
  *      candidate (own sign-bit array → pointer chase + header per
  *      estimate).
  *   3. `packed_*` — the block-major packed layout (contiguous
  *      sign-bit words + primitive factor columns, the
  *      fastscan/pack_codes.hpp role).
  *
  * Effective kernel bandwidth = entries/s × bytes-per-entry (sign
  * words + 3 factor floats). If that sits near `stream_gbps` the
  * kernel is memory-bound (at-bandwidth bound documented, parity
  * chase ends); if far below, it is compute-bound in scalar JVM code
  * (the reference's AVX512 VPSHUFB does 64 LUT lookups per
  * instruction — that gap is ISA, not layout). No Spark involved:
  * this measures the per-partition scan kernel itself.
  *
  * `sbt "runMain graft.KernelProbe"` → one JSON line +
  * results/kernel_roofline.json.
  */
object KernelProbe {
  private def envI(n: String, d: Int): Int = sys.env.get(n).map(_.toInt).getOrElse(d)

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dim = envI("SPARK_GRAFT_PROBE_DIM", 1536)
    val threads = envI("SPARK_GRAFT_CPUS", 32)
    val nPerThread = envI("SPARK_GRAFT_PROBE_ENTRIES", 1 << 17) // ×192 B ≈ 25 MB/thread
    val iters = envI("SPARK_GRAFT_PROBE_ITERS", 8)
    val words = (dim + 63) >> 6
    val bytesPerEntry = words * 8 + 12 // sign words + x2/facIp/facErr

    def inThreads(body: Int => Long): (Double, Long) = {
      val check = new AtomicLong()
      val ts = (0 until threads).map { t =>
        new Thread(() => check.addAndGet(body(t)))
      }
      val t0 = System.nanoTime()
      ts.foreach(_.start()); ts.foreach(_.join())
      ((System.nanoTime() - t0) / 1e9, check.get())
    }

    // --- 1. streaming bandwidth ceiling ---
    val streamLongs = 1 << 22 // 32 MB/thread, >> LLC share
    val streamArrs = Array.tabulate(threads)(t =>
      Array.tabulate(streamLongs)(i => (t * 1000003L + i) * 0x9E3779B97F4A7C15L))
    val (wallS, _) = inThreads { t =>
      var acc = 0L
      var it = 0
      while (it < iters) {
        val a = streamArrs(t)
        var i = 0
        while (i < a.length) { acc += a(i); i += 1 }
        it += 1
      }
      acc
    }
    val streamGbps = threads.toDouble * iters * streamLongs * 8 / wallS / 1e9

    // --- shared fixture: per-thread entry sets + one prepared query ---
    val rnd = new scala.util.Random(42)
    val qVec = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val cent = Array.fill(dim)(rnd.nextGaussian().toFloat * 0.1f)
    def mkEntries(t: Int): Array[IVFIndex.Entry] = {
      val r = new scala.util.Random(1000003L * t)
      Array.tabulate(nPerThread) { i =>
        val sign = Array.fill(words)(r.nextLong())
        IVFIndex.Entry(i.toLong, 0, sign, Array.empty[Byte],
          r.nextFloat(), r.nextFloat() * 1e-3f, 0f, r.nextFloat() * 1e-3f, 1f)
      }
    }
    val entrySets = Array.tabulate(threads)(mkEntries)
    // exBits = 8 → no F pre-unpack (these synthetic entries carry no
    // ex_code; the probe measures the estimate kernel only)
    // roll over at the run row bound, same as the real packers
    val packedSets: Array[Array[IVFIndex.PackedRun]] = entrySets.map { es =>
      val rs = scala.collection.mutable.ArrayBuffer(
        new IVFIndex.PackedRun(words, dim, 8))
      es.foreach { e =>
        if (rs.last.isFull) rs += new IVFIndex.PackedRun(words, dim, 8)
        rs.last.add(e)
      }
      rs.toArray
    }
    def prep(): RaBitQ.QueryCluster =
      RaBitQ.prepareQueryInto(qVec, cent, 14,
        new Array[Float](dim), new Array[Int](words << 8))

    // --- 2. entry-object layout ---
    def runEntry(): (Double, Long) = inThreads { t =>
      val qc = prep()
      val es = entrySets(t)
      var acc = 0L
      var it = 0
      while (it < iters) {
        var i = 0
        while (i < es.length) {
          val e = es(i)
          val lo = RaBitQ.estimateLowerLut(qc, e.sign_bits, e.x2, e.fac_ip, e.fac_err)
          if (lo < -1e18) acc += 1 // defeat DCE, never taken
          i += 1
        }
        it += 1
      }
      acc
    }
    // --- 3. packed layout ---
    def runPacked(): (Double, Long) = inThreads { t =>
      val qc = prep()
      val runs = packedSets(t)
      var acc = 0L
      var it = 0
      while (it < iters) {
        var b = 0
        while (b < runs.length) {
          val run = runs(b)
          var i = 0
          var sb = 0
          while (i < run.n) {
            val lo = RaBitQ.estimateLowerLutPacked(qc, run.sign, sb, words,
              run.x2(i), run.facIp(i), run.facErr(i))
            if (lo < -1e18) acc += 1
            i += 1
            sb += words
          }
          b += 1
        }
        it += 1
      }
      acc
    }
    // --- 3b. packed layout, fields hoisted to locals outside the
    // entry loop (the scanRuns-shape question: `run.sign`/`run.x2` are
    // var fields — does re-loading them per entry cost the 10% the r15
    // roofline measured at d=1536?) ---
    def runPackedHoist(): (Double, Long) = inThreads { t =>
      val qc = prep()
      val runs = packedSets(t)
      var acc = 0L
      var it = 0
      while (it < iters) {
        var b = 0
        while (b < runs.length) {
          val run = runs(b)
          val sign = run.sign
          val x2s = run.x2
          val ips = run.facIp
          val errs = run.facErr
          val n = run.n
          var i = 0
          var sb = 0
          while (i < n) {
            val lo = RaBitQ.estimateLowerLutPacked(qc, sign, sb, words,
              x2s(i), ips(i), errs(i))
            if (lo < -1e18) acc += 1
            i += 1
            sb += words
          }
          b += 1
        }
        it += 1
      }
      acc
    }
    // --- 3c. fused single-stream layout: entry i's record is
    // [words sign longs][1 long: (x2.bits<<32)|facIp.bits]
    // [1 long: (facErr.bits<<32)] — estimate touches exactly ONE
    // sequential stream instead of sign + 3 factor columns (4
    // hardware-prefetch streams/thread → 128 on 32 threads, past the
    // per-core tracker budget; the entry-object layout wins today
    // because TLAB allocation order makes it ~1 stream already). ---
    val stride = words + 2
    // lazy: only the fused variant reads these, and eagerly building
    // them adds ~870 MB of never-read heap (d=1536, 32×131072) to the
    // default packed run — GC noise in the very pairs the one-variant-
    // per-JVM protocol exists to keep clean
    lazy val fusedSets: Array[Array[Long]] = entrySets.map { es =>
      val a = new Array[Long](es.length * stride)
      var i = 0
      while (i < es.length) {
        val e = es(i)
        System.arraycopy(e.sign_bits, 0, a, i * stride, words)
        a(i * stride + words) =
          (java.lang.Float.floatToRawIntBits(e.x2).toLong << 32) |
            (java.lang.Float.floatToRawIntBits(e.fac_ip).toLong & 0xFFFFFFFFL)
        a(i * stride + words + 1) =
          java.lang.Float.floatToRawIntBits(e.fac_err).toLong << 32
        i += 1
      }
      a
    }
    def runFused(): (Double, Long) = inThreads { t =>
      val qc = prep()
      val a = fusedSets(t)
      val nE = nPerThread
      var acc = 0L
      var it = 0
      while (it < iters) {
        var i = 0
        var sb = 0
        while (i < nE) {
          val f0 = a(sb + words)
          val f1 = a(sb + words + 1)
          val lo = RaBitQ.estimateLowerLutPacked(qc, a, sb, words,
            java.lang.Float.intBitsToFloat((f0 >>> 32).toInt),
            java.lang.Float.intBitsToFloat(f0.toInt),
            java.lang.Float.intBitsToFloat((f1 >>> 32).toInt))
          if (lo < -1e18) acc += 1
          i += 1
          sb += stride
        }
        it += 1
      }
      acc
    }
    // ONE variant per JVM (plus the entry baseline): warming all four
    // in the same process pollutes the shared lutSumPop inlining
    // profile — measured 25% swings on an identical layout when the
    // variants shared a JVM. Speedups are in-JVM relative to entry, so
    // machine state cancels.
    // "packed" = the hoisted loop, the shape scanRuns actually runs
    // since the r16 fix; "packed_unhoisted" preserves the pre-fix loop
    // for the A/B record; "fused" is the single-stream experiment
    // (interleaving factors into the sign stream — measured ~equal to
    // hoisting at d=1536 and slightly better at d=64, not worth the
    // at-rest format change).
    val variant = sys.env.getOrElse("SPARK_GRAFT_PROBE_VARIANT", "packed")
    val runVariant: () => (Double, Long) = variant match {
      case "packed" => () => runPackedHoist()
      case "packed_unhoisted" => () => runPacked()
      case "fused" => () => runFused()
      case other => sys.error(s"unknown SPARK_GRAFT_PROBE_VARIANT '$other'")
    }
    // Paired interleaved samples after warmup: the machine's memory
    // bandwidth swings 2-3x between JVMs (stream_gbps 27-86 observed
    // across one r16 session), so a single entry/variant pair is
    // unreadable. Each pair times entry then the variant back-to-back
    // (same machine seconds); the per-pair ratio is drift-robust and
    // the MEDIAN of pairs is the committed statistic, with every raw
    // pair in the JSON (the bench dispersion discipline).
    val pairs = envI("SPARK_GRAFT_PROBE_PAIRS", 5)
    runEntry(); runVariant() // JIT warmup
    val samples = (0 until pairs).map { _ =>
      val e = runEntry()._1
      val v = runVariant()._1
      (e, v)
    }
    val ratios = samples.map { case (e, v) => e / v }.sorted
    val medianSpeedup =
      if (ratios.length % 2 == 1) ratios(ratios.length / 2)
      else (ratios(ratios.length / 2 - 1) + ratios(ratios.length / 2)) / 2
    val wallE = samples.map(_._1).min
    val wallP = samples.map(_._2).min
    val totalEst = threads.toDouble * iters * nPerThread
    def usPer(w: Double) = w / totalEst * 1e6
    def gbps(w: Double) = totalEst * bytesPerEntry / w / 1e9
    val line =
      s"""{"probe":"kernel_roofline","dim":$dim,"threads":$threads,""" +
        s""""entries_per_thread":$nPerThread,"iters":$iters,""" +
        s""""variant":"${ProbeJson.esc(variant)}",""" +
        s""""bytes_per_entry":$bytesPerEntry,"stream_gbps":$streamGbps,""" +
        s""""entry_us_per_est":${usPer(wallE)},"entry_gbps":${gbps(wallE)},""" +
        s""""packed_us_per_est":${usPer(wallP)},"packed_gbps":${gbps(wallP)},""" +
        s""""packed_speedup":${wallE / wallP},""" +
        s""""median_pair_speedup":$medianSpeedup,""" +
        s""""pair_ratios":${ratios.map(r => f"$r%.4f").mkString("[", ",", "]")},""" +
        s""""pct_of_bandwidth_packed":${100.0 * gbps(wallP) / streamGbps}}""" + "\n"
    print(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "results/kernel_roofline.json")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(out).toAbsolutePath.getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line)
  }
}
