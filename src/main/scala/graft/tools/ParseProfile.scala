package graft.tools

import graft.fixtures.PagesGen
import graft.pipeline.Extract

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev utility: the pure-JVM control for the N-vs-4N methodology and a JFR
  * profiling target — a fixed thread pool driving `Extract.parseRow` over
  * the synthesized corpus, no Spark anywhere, so (a) thread-scaling numbers
  * isolate the VM's memory-bandwidth ceiling from any Spark property and
  * (b) `-XX:StartFlightRecording` profiles land on the parse core alone.
  *
  * Usage: ParseProfile [replicate=40] [fat=16] [threads=8] [reps=3]
  * Run via plain java (no Spark session needed) with the classes dir and
  * the Spark jars dir glob on -cp.
  */
object ParseProfile {
  def main(args: Array[String]): Unit = {
    val replicate = if (args.length > 0) args(0).toInt else 40
    val fat = if (args.length > 1) args(1).toInt else 16
    val threads = if (args.length > 2) args(2).toInt else 8
    val reps = if (args.length > 3) args(3).toInt else 3

    val docs = (0 until replicate).flatMap(r => PagesGen.docsFor(r, fat)).toArray
    println(s"[profile] corpus: ${docs.length} docs, " +
      f"${docs.map(d => (if (d.html != null) d.html.length else d.text.length).toLong).sum / 1e6}%.1f MB payload")

    def pass(): Double = {
      val next = new AtomicInteger(0)
      val chars = new AtomicLong(0)
      val parsed = new AtomicInteger(0)
      // worker failures must fail the pass — a silently-dead thread would
      // publish inflated docs/s into the scaling-control numbers
      val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val t0 = System.nanoTime()
      val pool = (0 until threads).map { _ =>
        new Thread(() => {
          try {
            var i = next.getAndIncrement()
            while (i < docs.length) {
              val d = docs(i)
              // same per-row config as the benched pipeline (incl. the OCR
              // seam for the corpus's scanned docs) — the control must
              // measure the same work the pipeline distributes
              val row = Extract.parseRow(d.url, d.html, d.text, 0, "construction",
                ocr = Some(graft.pipeline.FakeOcrEngine))
              chars.addAndGet(row.chars_out)
              parsed.incrementAndGet()
              i = next.getAndIncrement()
            }
          } catch { case t: Throwable => failure.compareAndSet(null, t) }
        })
      }
      pool.foreach(_.start()); pool.foreach(_.join())
      if (failure.get() != null) throw failure.get()
      require(parsed.get() == docs.length,
        s"parsed ${parsed.get()} of ${docs.length} docs")
      require(chars.get() > 0, "parse produced no output")
      (System.nanoTime() - t0) / 1e9
    }

    pass(); pass() // JIT warmup
    val times = (1 to reps).map(_ => pass())
    val best = times.min
    println(f"[profile] threads=$threads docs=${docs.length} best=$best%.2f s " +
      f"(${docs.length / best}%.1f docs/s) all=${times.map(t => f"$t%.2f").mkString(",")}")
    println(s"[profile] tlMatcher inits: ${graft.core.Rx.tlInits.get()}")
  }
}
