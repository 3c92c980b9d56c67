package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.streaming.Trigger

/** Throughput-envelope probe for the WebSocket connector — the
  * reference's ENTIRE job is this connector, and its published envelope
  * is only its hard-coded cadence constants (50 ms producer poll, 10 s
  * idle timeout, 5 s reconnect — BASELINE.md's reference table); this
  * main measures what our connector actually sustains END-TO-END at
  * local[32]: producer thread → RFC 6455 socket (the in-process
  * `TestWsServer`) → reader thread → bounded buffer → micro-batch →
  * counted sink. Numbers land in BASELINE.md beside the reference
  * constants.
  *
  * Segments:
  *  1. sustained ingest, frame sizes 64 / 512 / 4096 bytes: a
  *     tight-loop producer pushes for ~8 s; reported frames/sec and
  *     MB/s count only rows that ARRIVED AT THE SINK (not producer
  *     speed), with the drain included so the number is conservative.
  *  2. slow consumer + admission control: full-speed producer,
  *     100 ms sleep per micro-batch, maxBufferRows = 10 000 — reports
  *     sent / delivered / shed, demonstrating the bounded buffer sheds
  *     load instead of growing without limit (the reference's
  *     single-threaded callback model simply backpressures the TCP
  *     socket; our reader thread decouples and sheds at a declared
  *     bound).
  *
  * Run: `sbt "Test/runMain graft.WsThroughputProbe"` (nothing else on
  * the box — this is a wall-clock measurement).
  */
object WsThroughputProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    spark.sparkContext.setLogLevel("WARN")

    def segment(frameBytes: Int, seconds: Int, slowConsumerMs: Long,
        maxBufferRows: Int, tag: String): Unit = {
      val server = new TestWsServer
      val delivered = new AtomicLong(0L)
      val payload = "x" * frameBytes
      val q = spark.readStream.format("websocket")
        .option("url", server.url)
        .option("key", "websocket_1")
        .option("reconnectDelayMs", "200")
        .option("connectTimeoutMs", "2000")
        .option("maxBufferRows", maxBufferRows.toString)
        .load()
        .writeStream
        .trigger(Trigger.ProcessingTime(0L))
        .foreachBatch { (df: Dataset[Row], _: Long) =>
          delivered.addAndGet(df.count())
          if (slowConsumerMs > 0) Thread.sleep(slowConsumerMs)
          ()
        }
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("wsprobe_").toString)
        .start()
      try {
        require(server.awaitConnect(15), "source never connected")
        var sent = 0L
        val t0 = System.nanoTime()
        val deadline = t0 + seconds * 1000000000L
        while (System.nanoTime() < deadline) {
          server.send(payload)
          sent += 1
        }
        val sendSecs = (System.nanoTime() - t0) / 1e9
        // drain: give the pipeline time to pull the buffered tail through
        val drainDeadline = System.currentTimeMillis() + 10000
        var last = -1L
        while (System.currentTimeMillis() < drainDeadline &&
            delivered.get() != last) {
          last = delivered.get(); Thread.sleep(500)
        }
        val d = delivered.get()
        val fps = d / sendSecs
        val mbps = fps * frameBytes / 1e6
        println(f"[wsprobe] $tag%-28s frame=$frameBytes%5d B sent=$sent%9d " +
          f"delivered=$d%9d shed=${sent - d}%8d rate=$fps%9.0f frames/s " +
          f"($mbps%7.1f MB/s payload)")
      } finally {
        q.stop(); server.close()
      }
    }

    Seq(64, 512, 4096).foreach { s =>
      segment(s, seconds = 8, slowConsumerMs = 0L,
        maxBufferRows = 1 << 20, tag = s"sustained ingest")
    }
    segment(512, seconds = 8, slowConsumerMs = 100L,
      maxBufferRows = 10000, tag = "slow consumer (bounded)")
    spark.stop()
  }
}
